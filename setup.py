"""Setuptools shim. All metadata lives in pyproject.toml.

Exists because this image ships setuptools 65.5 WITHOUT the ``wheel``
package, so pip's PEP 660 editable path (``pip install -e .``) dies in
``bdist_wheel`` during metadata generation. The legacy editable
install works and is what CI/dev should use here:

    python setup.py develop

On any environment that has ``wheel`` (or setuptools >= 70.1, which
bundles bdist_wheel), plain ``pip install -e .`` / ``pip install .``
works directly from pyproject.toml and this file is inert.
"""

from setuptools import setup

setup()
