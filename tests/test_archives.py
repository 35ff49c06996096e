"""Archive sources (sources/archives.py): tar/tgz/zip member explosion
through binaryFile + Arrow, member filtering, and composition with the
format sniffer + decoders (a mixed-media tarball becomes typed rows)."""

from __future__ import annotations

import io
import tarfile
import zipfile

import numpy as np

from wc_vector_indexing_spark.sources.archives import read_archive_members


def _make_tar(path, members, gz=False):
    mode = "w:gz" if gz else "w"
    with tarfile.open(path, mode) as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_tar_and_tgz_members(spark, tmp_path):
    members = {
        "docs/a.txt": b"alpha document text",
        "docs/b.txt": b"beta document text",
        "media/c.pgm": b"P5\n2 1\n255\n\x00\xff",
    }
    _make_tar(tmp_path / "one.tar", members)
    _make_tar(tmp_path / "two.tar.gz", {"docs/z.txt": b"gzipped member"}, gz=True)
    got = {
        (r.archive.rsplit("/", 1)[-1], r.member): bytes(r.content)
        for r in read_archive_members(spark, str(tmp_path)).collect()
    }
    assert got[("one.tar", "docs/a.txt")] == b"alpha document text"
    assert got[("two.tar.gz", "docs/z.txt")] == b"gzipped member"
    assert len(got) == 4


def test_zip_members_and_pattern_filter(spark, tmp_path):
    zp = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("keep/one.json", b'{"a": 1}')
        zf.writestr("keep/two.json", b'{"b": 2}')
        zf.writestr("skip/ignore.bin", b"\x00\x01")
    rows = read_archive_members(spark, str(zp), member_pattern="keep/").collect()
    assert sorted(r.member for r in rows) == ["keep/one.json", "keep/two.json"]
    assert all(r.size == len(bytes(r.content)) for r in rows)


def test_mixed_media_tar_composes_with_sniff_and_decode(spark, tmp_path):
    """The archive-of-media ingest: tar in, sniffed + decoded rows out."""
    from tests.test_jpeg import encode_baseline
    from wc_vector_indexing_spark.operators.bmp_gif import sniff_format
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    members = {
        "imgs/x.jpg": encode_baseline(img),
        "imgs/y.pgm": b"P5\n8 8\n255\n" + img.tobytes(),
        "notes/readme.txt": b"not an image",
    }
    _make_tar(tmp_path / "media.tar", members)
    rows = read_archive_members(spark, str(tmp_path / "media.tar")).collect()
    by_member = {r.member: bytes(r.content) for r in rows}
    assert sniff_format(by_member["imgs/x.jpg"]) == "jpeg"
    assert sniff_format(by_member["imgs/y.pgm"]) == "pgm"
    assert sniff_format(by_member["notes/readme.txt"]) == "unknown"
    decoded = decode_image(by_member["imgs/y.pgm"])
    assert decoded.shape == (8, 8)
    assert int(np.abs(decode_image(by_member["imgs/x.jpg"]).astype(int)
                      - img.astype(int)).max()) <= 1


def test_webdataset_sample_grouping(spark, tmp_path):
    from wc_vector_indexing_spark.sources.archives import webdataset_samples

    members = {
        "train/n01.jpg": b"JPGBYTES1",
        "train/n01.cls": b"7",
        "train/n01.json": b'{"a":1}',
        "train/n02.jpg": b"JPGBYTES22",
        "train/n02.cls": b"3",
        # multi-extension rule: part type is everything after the FIRST dot
        "train/n02.seg.png": b"SEGPNG",
        "README": b"not a sample part",  # extension-less -> dropped
    }
    _make_tar(str(tmp_path / "shard0.tar"), members)
    rows = webdataset_samples(
        read_archive_members(spark, str(tmp_path / "shard0.tar"))
    ).collect()
    by_key = {r.key: r for r in rows}
    assert set(by_key) == {"n01", "n02"}
    assert by_key["n01"].n_parts == 3
    assert sorted(by_key["n01"].parts) == ["cls", "jpg", "json"]
    assert bytes(by_key["n01"].parts["jpg"]) == b"JPGBYTES1"
    assert sorted(by_key["n02"].parts) == ["cls", "jpg", "seg.png"]
    assert bytes(by_key["n02"].parts["seg.png"]) == b"SEGPNG"
    assert by_key["n02"].total_bytes == len(b"JPGBYTES22") + 1 + len(b"SEGPNG")


def test_webdataset_same_key_across_archives_stays_separate(spark, tmp_path):
    from wc_vector_indexing_spark.sources.archives import webdataset_samples

    _make_tar(str(tmp_path / "s0.tar"), {"k.txt": b"zero"})
    _make_tar(str(tmp_path / "s1.tar"), {"k.txt": b"one!"})
    rows = webdataset_samples(
        read_archive_members(spark, str(tmp_path / "s*.tar"))
    ).collect()
    # shard boundaries are sample boundaries: same key in two shards is
    # two samples (WebDataset keys are only unique per shard)
    assert len(rows) == 2
    assert {bytes(r.parts["txt"]) for r in rows} == {b"zero", b"one!"}


def test_webdataset_write_read_roundtrip(spark, tmp_path):
    """Egress half: samples -> tar shards -> back through the archive
    source and sample grouping, losslessly; sample parts contiguous."""
    import tarfile

    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.archives import (
        webdataset_samples,
        write_webdataset,
    )

    df = (
        spark.range(12)
        .select(
            F.concat(F.lit("s"), F.col("id")).alias("key"),
            F.map_from_arrays(
                F.array(F.lit("txt"), F.lit("cls")),
                F.array(
                    F.encode(F.concat(F.lit("body-"), F.col("id")), "utf-8"),
                    F.encode((F.col("id") % 3).cast("string"), "utf-8"),
                ),
            ).alias("parts"),
        )
        .repartition(3)
    )
    out = str(tmp_path / "wds")
    manifest = write_webdataset(df, out)
    assert sum(r.n_samples for r in manifest.collect()) == 12

    back = webdataset_samples(
        read_archive_members(spark, out + "/shard-*.tar")
    ).collect()
    assert len(back) == 12
    got = {r.key: bytes(r.parts["txt"]) for r in back}
    assert got == {f"s{i}": f"body-{i}".encode() for i in range(12)}

    # contiguity: within every shard, the two members of a sample are
    # adjacent in the tar stream
    import glob

    for shard in glob.glob(out + "/shard-*.tar"):
        names = [m.name for m in tarfile.open(shard).getmembers()]
        keys = [n.split(".")[0] for n in names]
        assert keys == sorted(keys, key=keys.index)  # grouped runs
        for i in range(0, len(keys), 2):
            assert keys[i] == keys[i + 1]


def test_webdataset_duplicate_member_names_survive(spark, tmp_path):
    """A malformed tar repeating a member name must not fail the
    stage: the larger body wins deterministically."""
    import io
    import tarfile

    from wc_vector_indexing_spark.sources.archives import webdataset_samples

    with tarfile.open(str(tmp_path / "dup.tar"), "w") as tf:
        for body in (b"short", b"the-longer-body"):
            info = tarfile.TarInfo("k.txt")
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    (row,) = webdataset_samples(
        read_archive_members(spark, str(tmp_path / "dup.tar"))
    ).collect()
    assert bytes(row.parts["txt"]) == b"the-longer-body"
    assert row.n_parts == 1 and row.total_bytes == len(b"the-longer-body")
