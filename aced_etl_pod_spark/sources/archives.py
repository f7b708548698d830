"""Zip-of-NDJSON ingestion (reference R5: blob fetch + unarchive,
etl-job/fhir_import_export.py:148-180 — download, then ``unzip -o -j``).

Archives are unpacked driver-side before ``spark.read.json`` (zip is not a
splittable format; at scale the object store holds *many* archives and the
unpack fans out per-archive — one driver/task per zip, NDJSON inside is the
splittable unit).
"""

from __future__ import annotations

import os
import shutil
import zipfile

from aced_etl_pod_spark.tables import session_scratch_dir


def unzip_to_dir(zip_path: str, sub: str = "unzipped") -> str:
    """Extract an archive into a scratch dir (flattening paths, like the
    reference's ``unzip -j``), returning the directory."""
    out = session_scratch_dir(sub)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            target = os.path.join(out, os.path.basename(info.filename))
            with zf.open(info) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst)
    return out


def zip_dir(src_dir: str, zip_path: str, exts: tuple[str, ...] = (".ndjson", ".json")) -> str:
    """Zip a directory of export files (snapshot publish analog, R16,
    fhir_import_export.py:341-352)."""
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src_dir):
            for fn in sorted(files):
                if exts and not fn.endswith(exts):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, arcname=os.path.relpath(full, src_dir))
    return zip_path
