"""Legacy-tooling shim: all metadata lives in pyproject.toml; this exists
so environments with setuptools < 64 (no PEP 660 editable support, no
bundled bdist_wheel) can still `python setup.py develop` / `pip install .`."""

from setuptools import setup

setup()
