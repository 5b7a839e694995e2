#!/usr/bin/env python
"""Build the distributable wheel with the stdlib only (PEP 427).

The reference ships a versioned installable artifact (reference
``pom.xml:27`` 1.1.0-SNAPSHOT, ``rocana-release.sh``, install docs
``README.md:22-27``); this is the PySpark engine's equivalent release
path.  The container pins setuptools 65 (whose ``bdist_wheel`` needs the
absent ``wheel`` package) and forbids installing build tooling, so the
wheel is assembled directly from the PEP 427/PEP 376 specs: a zip of the
package tree plus a ``*.dist-info`` directory carrying METADATA (core
metadata 2.1, fields read from pyproject.toml), WHEEL, and a RECORD of
urlsafe-base64 sha256 digests.  ``pip install dist/*.whl`` accepts the
result — RECORD hashes are verified by pip at install time, so a
corrupted artifact fails loudly.

Determinism: entries are written in sorted order with a fixed timestamp,
so rebuilding an unchanged tree yields a byte-identical wheel (the same
property a reproducible Maven build gives the reference's jar).

Usage: python tools/build_wheel.py [outdir=dist/]
Verify: python tools/verify_install.py  (installs to a temp --target and
runs the import + UDAF surface against the INSTALLED package, not CWD).
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "rocana_impala_udfs_spark"
# fixed timestamp for reproducible zips (any valid DOS date works)
ZDATE = (2020, 1, 1, 0, 0, 0)


def _record_hash(data: bytes) -> str:
    digest = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(digest).rstrip(b"=").decode()


def collect_files() -> list[str]:
    """Package payload: every .py under the package, plus the declared
    package data (the prebuilt UDAF jar and its Java sources — mirrors
    [tool.setuptools.package-data] in pyproject.toml)."""
    keep_ext = {".py", ".jar", ".java"}
    out: list[str] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if os.path.splitext(f)[1] in keep_ext:
                out.append(os.path.relpath(os.path.join(root, f), REPO))
    return sorted(out)


def build(outdir: str) -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    name = proj["name"].replace("-", "_")
    version = proj["version"]
    distinfo = f"{name}-{version}.dist-info"
    wheel_name = f"{name}-{version}-py3-none-any.whl"

    metadata_lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {version}",
        f"Summary: {proj['description']}",
        "License: Apache-2.0",
        f"Requires-Python: {proj['requires-python']}",
    ]
    for dep in proj.get("dependencies", []):
        metadata_lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        metadata_lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            metadata_lines.append(f'Requires-Dist: {dep}; extra == "{extra}"')
    metadata = ("\n".join(metadata_lines) + "\n").encode()

    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: tools/build_wheel.py (stdlib)\n"
        "Root-Is-Purelib: true\n"
        "Tag: py3-none-any\n"
    ).encode()

    os.makedirs(outdir, exist_ok=True)
    wheel_path = os.path.join(outdir, wheel_name)
    record_rows: list[str] = []

    with zipfile.ZipFile(wheel_path, "w", zipfile.ZIP_DEFLATED) as zf:

        def add(arcname: str, data: bytes) -> None:
            info = zipfile.ZipInfo(arcname, date_time=ZDATE)
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
            record_rows.append(f"{arcname},{_record_hash(data)},{len(data)}")

        for rel in collect_files():
            with open(os.path.join(REPO, rel), "rb") as fh:
                add(rel.replace(os.sep, "/"), fh.read())
        add(f"{distinfo}/METADATA", metadata)
        add(f"{distinfo}/WHEEL", wheel_meta)
        record_rows.append(f"{distinfo}/RECORD,,")
        record = ("\n".join(record_rows) + "\n").encode()
        info = zipfile.ZipInfo(f"{distinfo}/RECORD", date_time=ZDATE)
        info.external_attr = 0o644 << 16
        zf.writestr(info, record)

    return wheel_path


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    path = build(outdir)
    print(path)
