"""The protobuf path-forwarding shim must behave as a namespace PORTION:
google.protobuf resolves through the vendored runtime while every OTHER
google.* package on sys.path keeps resolving (r13 ADVICE — a plain regular
package at the head of sys.path would terminate namespace resolution and
shadow google.auth/google.cloud on hosts that ship them without protobuf).
Runs in a subprocess so the parent's already-imported google module can't
mask the activation-order semantics."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys, tempfile, os
sys.path.insert(0, {repo!r})
d = tempfile.mkdtemp()
os.makedirs(f"{{d}}/google/fakeauth")
open(f"{{d}}/google/fakeauth/__init__.py", "w").write("MARK = 42\n")
sys.path.append(d)  # another google.* portion, present BEFORE activation
from vendor.protobuf_compat.activate import ensure_protobuf
assert ensure_protobuf() is True
import google.protobuf
from google import fakeauth
assert fakeauth.MARK == 42
print("SHIM_NS_OK")
"""


def test_shim_is_namespace_portion_not_shadow():
    env = dict(os.environ)
    # force the shim path (hide any real protobuf install)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    if "SHIM_NS_OK" not in proc.stdout:
        # a host with a REAL protobuf install never engages the shim —
        # ensure_protobuf returns True before touching sys.path; the
        # namespace property still holds trivially there
        import importlib.util

        if importlib.util.find_spec("google.protobuf") is not None:
            import pytest

            pytest.skip("real protobuf installed; shim never engages")
        raise AssertionError(proc.stdout + proc.stderr)
