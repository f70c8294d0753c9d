"""Extract-stage utilities (SURVEY.md §2.1 S1/S2): streamed HTTP download +
zip decompression, mirroring reference extract/execute.py:10-33.

Driver-side by design — at 100 TB you don't pull archives through one
machine; you point ``spark.read`` at the object store and land data in a
splittable columnar format. These exist for parity with the reference's
single-archive bootstrap path.
"""

from __future__ import annotations

import os
import urllib.request
import zipfile

CHUNK_BYTES = 8192  # reference extract/execute.py:19 streams in 8 KiB chunks


def download_file(url: str, dest_path: str, *, chunk_bytes: int = CHUNK_BYTES) -> str:
    """Streamed GET → file. Non-2xx raises (the reference errors on
    non-200, extract/execute.py:14-16); chunked so a multi-GB archive never
    resides in memory."""
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    with urllib.request.urlopen(url) as resp:
        # file:// responses carry status None — only HTTP(S) has a code to
        # check (a failed local open raises at urlopen instead).
        status = getattr(resp, "status", None)
        if status is not None and status // 100 != 2:
            raise RuntimeError(f"download failed: HTTP {status} for {url}")
        with open(dest_path, "wb") as f:
            while chunk := resp.read(chunk_bytes):
                f.write(chunk)
    return dest_path


def extract_zip(
    archive_path: str, out_dir: str, *, delete_archive: bool = False
) -> list[str]:
    """Unzip all members (reference extract/execute.py:26-33 extracts then
    deletes the archive; deletion is opt-in here). Refuses path-traversal
    member names."""
    os.makedirs(out_dir, exist_ok=True)
    out_real = os.path.realpath(out_dir)
    extracted: list[str] = []
    with zipfile.ZipFile(archive_path) as zf:
        for member in zf.namelist():
            target = os.path.realpath(os.path.join(out_dir, member))
            if not target.startswith(out_real + os.sep) and target != out_real:
                raise ValueError(f"unsafe zip member path: {member!r}")
        zf.extractall(out_dir)
        extracted = [os.path.join(out_dir, m) for m in zf.namelist()]
    if delete_archive:
        os.remove(archive_path)
    return extracted
