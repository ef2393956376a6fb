"""Shim for legacy `pip install -e .` workflows (reference setup.py).

All metadata lives in pyproject.toml.
"""

from setuptools import setup

setup()
