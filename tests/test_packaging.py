"""Packaging metadata stays consistent with the code it ships.

The reference is a clone-and-run research repo (requirements.txt only,
no package metadata); the rebuild is a framework, so it is installable:
`pip install .` exposes the `plangen-tpu` console command
(pyproject.toml [project.scripts] -> plangen_tpu.cli:main).
These checks pin the metadata to the code without needing an install.
"""

import pathlib

import pytest

# stdlib tomllib is 3.11+; requires-python is >=3.10, so these metadata
# checks skip (not fail) on a 3.10 interpreter without the tomli backport
tomllib = pytest.importorskip("tomllib")

import plangen_tpu  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_pyproject():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_version_attr_is_the_single_source():
    meta = _load_pyproject()
    assert meta["project"]["dynamic"] == ["version"]
    assert (
        meta["tool"]["setuptools"]["dynamic"]["version"]["attr"]
        == "plangen_tpu.__version__"
    )
    # and the attr actually exists + looks like a version
    parts = plangen_tpu.__version__.split(".")
    assert len(parts) >= 2 and all(p.isdigit() for p in parts)


def test_console_script_target_resolves():
    meta = _load_pyproject()
    target = meta["project"]["scripts"]["plangen-tpu"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_declared_packages_match_tree():
    # every plangen_tpu subpackage is discoverable by the find directive
    meta = _load_pyproject()
    include = meta["tool"]["setuptools"]["packages"]["find"]["include"]
    assert include == ["plangen_tpu*"]
    for pkg_dir in (ROOT / "plangen_tpu").iterdir():
        if pkg_dir.is_dir() and not pkg_dir.name.startswith("__"):
            assert (pkg_dir / "__init__.py").exists(), (
                f"{pkg_dir.name} lacks __init__.py — it would be dropped "
                "from the wheel"
            )
