"""Build (and cache) the native host-ingest library libstrling_io.so."""

from __future__ import annotations

import hashlib
import os
import subprocess

_SRC_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_BZ2_SONAME = "/lib/x86_64-linux-gnu/libbz2.so.1.0"


def lib_path() -> str:
    """Compile csrc/strling_io.cc to a shared lib if needed; return its path."""
    srcs = sorted(
        os.path.join(_SRC_DIR, f) for f in os.listdir(_SRC_DIR) if f.endswith(".cc")
    )
    # hash headers too: a .h-only change must trigger a rebuild
    hdrs = sorted(
        os.path.join(_SRC_DIR, f) for f in os.listdir(_SRC_DIR) if f.endswith(".h")
    )
    h = hashlib.sha256()
    for s in srcs + hdrs:
        with open(s, "rb") as fh:
            h.update(fh.read())
    tag = h.hexdigest()[:16]
    out = os.path.join(_BUILD_DIR, f"libstrling_io-{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", "-pthread",
        *srcs, "-o", out + ".tmp", "-ldeflate", "-lz", "-llzma",
        # this image ships libbz2.so.1.0 without the unversioned symlink;
        # link the SONAME path when present, else the normal -lbz2
        *(( _BZ2_SONAME,) if os.path.exists(_BZ2_SONAME) else ("-lbz2",)),
    ]
    subprocess.run(cmd, check=True)
    os.replace(out + ".tmp", out)
    # evict stale hash variants so the cache doesn't grow unboundedly
    for f in os.listdir(_BUILD_DIR):
        if f.startswith("libstrling_io-") and f != os.path.basename(out):
            try:
                os.unlink(os.path.join(_BUILD_DIR, f))
            except OSError:
                pass
    return out
