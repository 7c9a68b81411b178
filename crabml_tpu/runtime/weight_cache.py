"""On-disk cache of repacked weight planes.

The native repack streams a multi-GB GGUF once per process (~80 s/7B on one
core); its output is deterministic in (file, layout, scale dtype), so warm
starts can skip it entirely: planes are saved as raw .npy files next to a
JSON manifest, keyed by a hash of the source file's identity. A warm load
is then mmap -> device_put (~6 s at 7B) — the closest TPU equivalent of
the reference's instant re-mmap (gguf.rs:789-833).

Layout: <cache_root>/<key>/manifest.json + NNN.npy. No pickle anywhere:
the manifest is JSON and the arrays are plain .npy, so a corrupted or
foreign cache can't execute anything; any mismatch falls back to repack.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from ..quant.planar import QTensor
from ..gguf.constants import GGMLType

_VERSION = 1


def _content_fingerprint(gguf_path: str, n: int = 1 << 20) -> str:
    """sha256 over the first `n` bytes (the GGUF header + metadata + the
    start of tensor data). Guards against a file mutated in place with a
    preserved mtime serving stale planes; hashing 1 MB costs ~ms, hashing
    the whole multi-GB file would defeat the cache's purpose."""
    h = hashlib.sha256()
    with open(gguf_path, "rb") as f:
        h.update(f.read(n))
    return h.hexdigest()[:16]


def cache_key(gguf_path: str, layout: str, scale_dtype: str) -> str:
    st = os.stat(gguf_path)
    ident = json.dumps(
        [os.path.abspath(gguf_path), st.st_size, int(st.st_mtime), layout,
         str(scale_dtype), _content_fingerprint(gguf_path), _VERSION]
    )
    return hashlib.sha256(ident.encode()).hexdigest()[:24]


def default_root() -> str:
    root = os.environ.get("CRABML_WEIGHT_CACHE")
    if root is None:
        root = os.path.join(
            os.path.dirname(__file__), "..", "..", ".cache", "weights"
        )
    return os.path.abspath(root)


def _encode(node, arrays: list, counter=None):
    if node is None:
        return {"t": "none"}
    if isinstance(node, QTensor):
        return {
            "t": "qtensor",
            "kind": int(node.kind),
            "shape": list(node.shape),
            "planes": {n: _encode(np.asarray(p), arrays) for n, p in node.planes.items()},
        }
    if isinstance(node, dict):
        return {"t": "dict", "items": {k: _encode(v, arrays) for k, v in node.items()}}
    a = np.asarray(node)
    arrays.append(a)
    return {"t": "array", "i": len(arrays) - 1, "dtype": str(a.dtype)}


def _decode(spec, load_array):
    t = spec["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _decode(v, load_array) for k, v in spec["items"].items()}
    if t == "qtensor":
        return QTensor(
            GGMLType(spec["kind"]),
            tuple(spec["shape"]),
            {n: _decode(p, load_array) for n, p in spec["planes"].items()},
        )
    return load_array(spec["i"], spec["dtype"])


def save(root: str, key: str, weights: dict) -> None:
    d = os.path.join(root, key)
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    arrays: list[np.ndarray] = []
    manifest = _encode(weights, arrays)
    for i, a in enumerate(arrays):
        # bf16 etc. save fine via .view on a supported byte dtype
        if a.dtype == np.dtype("V2") or "bfloat16" in str(a.dtype):
            np.save(os.path.join(tmp, f"{i}.npy"), a.view(np.uint16))
        else:
            np.save(os.path.join(tmp, f"{i}.npy"), a)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.isdir(d):  # racing writer finished first: keep theirs
        import shutil

        shutil.rmtree(tmp)
        return
    os.replace(tmp, d)


def load(root: str, key: str) -> dict | None:
    d = os.path.join(root, key)
    mpath = os.path.join(d, "manifest.json")
    if not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as f:
            manifest = json.load(f)

        def load_array(i, dtype):
            a = np.load(os.path.join(d, f"{i}.npy"), mmap_mode="r")
            if "bfloat16" in dtype:
                import ml_dtypes

                a = a.view(ml_dtypes.bfloat16)
            return a

        return _decode(manifest, load_array)
    except (OSError, ValueError, KeyError):
        return None
