"""Build the engine wheel with the stdlib only (VERDICT r11 #5).

The sandbox bans package installs and ships setuptools without the
``wheel`` plugin, so ``pip wheel`` dies at ``bdist_wheel``. A
pure-python wheel is just a zip with a ``.dist-info`` — this script
writes a spec-compliant one (PEP 427: METADATA, WHEEL, RECORD with
sha256 urlsafe-b64 digests) deterministically from
``batchprocessor_spark/**/*.py``.

Why it exists: the multi-JVM probe's ``wheel_deploy`` check ships
THIS artifact to real executor JVMs via ``spark.submit.pyFiles``,
replacing the executorEnv.PYTHONPATH workaround recorded in SCALE.md
(r10) — the deployment story a real cluster uses (``--py-files`` / a
site-package), tested instead of narrated.

Usage:
    python -m scripts.build_wheel [--out DIR]
Prints the built wheel's path.
"""

from __future__ import annotations

import argparse
import base64
import hashlib
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NAME, VERSION = "batchprocessor_spark", "0.1.0"
TAG = "py3-none-any"

METADATA = f"""Metadata-Version: 2.1
Name: batchprocessor-spark
Version: {VERSION}
Summary: PySpark-native analytics and micro-batch pipeline engine
Requires-Python: >=3.10
"""

WHEEL_META = f"""Wheel-Version: 1.0
Generator: scripts.build_wheel (stdlib)
Root-Is-Purelib: true
Tag: {TAG}
"""


def _digest(data: bytes) -> str:
    h = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(h).rstrip(b"=").decode()


def build(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    whl = os.path.join(out_dir, f"{NAME}-{VERSION}-{TAG}.whl")
    dist = f"{NAME}-{VERSION}.dist-info"
    record_rows: list[str] = []

    pkg_root = os.path.join(REPO, NAME)
    members: list[tuple[str, bytes]] = []
    for base, _dirs, files in sorted(os.walk(pkg_root)):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(base, fn)
            arc = os.path.relpath(path, REPO).replace(os.sep, "/")
            with open(path, "rb") as f:
                members.append((arc, f.read()))
    members.append((f"{dist}/METADATA", METADATA.encode()))
    members.append((f"{dist}/WHEEL", WHEEL_META.encode()))

    with zipfile.ZipFile(whl, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, data in members:
            # fixed timestamp → byte-identical rebuilds from the same
            # tree (zipfile epoch minimum is 1980)
            zi = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            z.writestr(zi, data)
            record_rows.append(f"{arc},{_digest(data)},{len(data)}")
        record_rows.append(f"{dist}/RECORD,,")
        zi = zipfile.ZipInfo(
            f"{dist}/RECORD", date_time=(1980, 1, 1, 0, 0, 0)
        )
        zi.external_attr = 0o644 << 16
        z.writestr(zi, "\n".join(record_rows) + "\n")
    return whl


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist"))
    args = ap.parse_args()
    print(build(args.out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
