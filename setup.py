"""Thin shim for environments whose setuptools lacks PEP-660 editable
wheels (no `wheel` package): `pip install -e . --no-use-pep517` takes
the legacy develop path through this file; all metadata lives in
pyproject.toml (PEP 621)."""

from setuptools import setup

setup()
