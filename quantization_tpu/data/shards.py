"""Sharded raw-f16 corpus format + native streaming loader.

The reference's corpus path materializes and shuffles the WHOLE corpus in
host RAM (`quantization/quantization.py:798-809`), which caps corpus size at
RAM and makes multi-host training re-read everything everywhere.  This
module is the production-scale replacement:

* **Format**: a directory of raw little-endian float16 shard files
  ((frames, dim) row-major) plus a ``manifest.json``::

      {"dim": 512, "dtype": "float16",
       "shards": [{"file": "shard_00000.raw", "frames": 1048576}, ...]}

* **Loader**: a C++ shared library (``native/qtz_loader.cc``) with reader
  threads filling a bounded shuffle pool; consumers draw uniformly random
  pooled frames (each draw backfilled by freshly streamed data — a
  sliding-window shuffle with O(pool) memory) and receive float32 batches
  ready for device upload.  Built on demand with g++; a pure-NumPy fallback
  (``stream_hdf5_frames``-style) keeps everything working without a
  toolchain.

* **Multi-host**: shards are assigned ``host_index::num_hosts`` so each
  host streams a disjoint corpus partition (pass ``jax.process_index()``).
"""

from __future__ import annotations

import ctypes
import json
import pathlib
import subprocess
import threading
from typing import Iterable, Iterator, Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).parent / "native"
_LOCK = threading.Lock()
_LIB = None


def write_shards(
    outdir,
    arrays: Iterable[np.ndarray],
    frames_per_shard: int = 1 << 20,
) -> dict:
    """Write (*, dim) float arrays into raw-f16 shards + manifest; returns
    the manifest dict."""
    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    dim = None
    shards = []
    cur = None
    cur_frames = 0
    shard_idx = 0

    def flush():
        nonlocal cur, cur_frames, shard_idx
        if cur is None or cur_frames == 0:
            return
        name = f"shard_{shard_idx:05d}.raw"
        with open(outdir / name, "wb") as f:
            f.write(np.concatenate(cur, axis=0).astype("<f2").tobytes())
        shards.append({"file": name, "frames": int(cur_frames)})
        shard_idx += 1
        cur, cur_frames = [], 0

    cur = []
    for x in arrays:
        x = np.asarray(x)
        x = x.reshape(-1, x.shape[-1])
        if dim is None:
            dim = int(x.shape[-1])
        assert x.shape[-1] == dim, (x.shape, dim)
        pos = 0
        while pos < x.shape[0]:
            room = frames_per_shard - cur_frames
            take = min(room, x.shape[0] - pos)
            cur.append(x[pos : pos + take])
            cur_frames += take
            pos += take
            if cur_frames == frames_per_shard:
                flush()
    flush()
    manifest = {"dim": dim, "dtype": "float16", "shards": shards}
    with open(outdir / "manifest.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def convert_hdf5_to_shards(hdf5_path, outdir, frames_per_shard: int = 1 << 20):
    """Convert a reference-format HDF5 archive
    (`quantization/quantization.py:755-761`) into raw shards."""
    import h5py

    def gen():
        with h5py.File(hdf5_path, "r") as hf:
            for key in sorted(hf.keys()):
                yield np.asarray(hf[key])

    return write_shards(outdir, gen(), frames_per_shard)


def rebatch(
    arrays: Iterable[np.ndarray], batch_size: int, dtype=np.float32
) -> Iterator[np.ndarray]:
    """Re-chunk an order-preserving stream of (*, dim) arrays into
    ``batch_size``-row batches (one final partial batch; no shuffling, no
    duplication).  The single shared batching path for every sequential
    reader (shards, HDF5, CLI)."""
    buf = None
    for data in arrays:
        data = np.asarray(data).reshape(-1, np.asarray(data).shape[-1])
        if buf is not None and buf.shape[0]:
            data = np.concatenate([buf, data])
        n_full = (data.shape[0] // batch_size) * batch_size
        for start in range(0, n_full, batch_size):
            yield data[start : start + batch_size].astype(dtype, copy=False)
        buf = data[n_full:]
    if buf is not None and buf.shape[0]:
        yield buf.astype(dtype, copy=False)


def iter_shards_sequential(
    shard_dir,
    batch_size: int,
    *,
    host_index: int = 0,
    num_hosts: int = 1,
    dtype=np.float32,
) -> Iterator[np.ndarray]:
    """Order-preserving batch iterator: shard files in manifest order, rows
    in file order, no shuffling and no duplication.  Use this for bulk
    encode/decode where output row k must correspond to corpus frame k;
    the shuffling :class:`ShardStream` pool is for training only.

    ``dtype=np.float16`` yields the raw storage dtype with ZERO host-side
    conversion (views of the file read) — the TPU-native bulk-encode path
    uploads f16 and upcasts on device, where the cast fuses for free; the
    host-side f16->f32 astype otherwise caps a single core at ~125K
    frames/s (measured, BASELINE.md data-path section)."""
    shard_dir = pathlib.Path(shard_dir)
    with open(shard_dir / "manifest.json") as f:
        manifest = json.load(f)
    assert manifest["dtype"] == "float16", manifest
    dim = int(manifest["dim"])

    def files():
        for entry in manifest["shards"][host_index::num_hosts]:
            yield np.fromfile(shard_dir / entry["file"], dtype="<f2").reshape(
                -1, dim
            )

    yield from rebatch(files(), batch_size, dtype)


def _build_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native loader; None if no toolchain."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = _NATIVE_DIR / "qtz_loader.cc"
        lib_path = _NATIVE_DIR / "libqtz_loader.so"
        if not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime:
            try:
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-std=c++17",
                        "-shared",
                        "-fPIC",
                        "-pthread",
                        str(src),
                        "-o",
                        str(lib_path),
                    ],
                    check=True,
                    capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                return None
        lib = ctypes.CDLL(str(lib_path))
        lib.qtz_loader_create.restype = ctypes.c_void_p
        lib.qtz_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.qtz_loader_next.restype = ctypes.c_int64
        lib.qtz_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.qtz_loader_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class ShardStream:
    """Iterator of (batch, dim) float32 batches from a shard directory.

    Uses the native C++ loader when a toolchain is available, otherwise a
    NumPy fallback with the same sharding/shuffling semantics."""

    def __init__(
        self,
        shard_dir,
        batch_size: int,
        *,
        host_index: int = 0,
        num_hosts: int = 1,
        seed: int = 0,
        pool_frames: int = 1 << 18,
        num_threads: int = 4,
        repeat: bool = True,
        force_python: bool = False,
    ):
        shard_dir = pathlib.Path(shard_dir)
        with open(shard_dir / "manifest.json") as f:
            manifest = json.load(f)
        assert manifest["dtype"] == "float16", manifest
        if batch_size > pool_frames:
            raise ValueError(
                f"batch_size ({batch_size}) must not exceed pool_frames "
                f"({pool_frames}): batches are drawn from the shuffle pool "
                "without replacement"
            )
        self.dim = int(manifest["dim"])
        self.batch_size = batch_size
        entries = manifest["shards"][host_index::num_hosts]
        self._paths = [str(shard_dir / e["file"]) for e in entries]
        self._frames = [int(e["frames"]) for e in entries]
        self._repeat = repeat
        self._seed = seed + host_index
        self._pool_frames = pool_frames
        self._num_threads = num_threads
        self._handle = None
        self._lib = None if force_python else _build_native()
        if self._lib is not None:
            arr_paths = (ctypes.c_char_p * len(self._paths))(
                *[p.encode() for p in self._paths]
            )
            arr_frames = (ctypes.c_int64 * len(self._frames))(*self._frames)
            self._handle = self._lib.qtz_loader_create(
                arr_paths,
                arr_frames,
                len(self._paths),
                self.dim,
                pool_frames,
                batch_size,
                self._seed,
                num_threads,
                1 if repeat else 0,
            )
        self.native = self._handle is not None

    def __iter__(self) -> Iterator[np.ndarray]:
        if self.native:
            out = np.empty((self.batch_size, self.dim), dtype=np.float32)
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            while True:
                n = self._lib.qtz_loader_next(self._handle, ptr)
                if n < self.batch_size:
                    if n > 0:  # final partial batch (non-repeat end)
                        yield out[:n].copy()
                    return
                yield out.copy()
        else:
            yield from self._python_stream()

    def _python_stream(self) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self._seed)
        pool = np.empty((self._pool_frames, self.dim), dtype=np.float16)
        fill = 0
        while True:
            order = rng.permutation(len(self._paths))
            for si in order:
                data = np.fromfile(self._paths[si], dtype="<f2").reshape(
                    -1, self.dim
                )
                pos = 0
                while pos < data.shape[0]:
                    take = min(self._pool_frames - fill, data.shape[0] - pos)
                    pool[fill : fill + take] = data[pos : pos + take]
                    fill += take
                    pos += take
                    while fill == self._pool_frames:
                        # Draw WITHOUT replacement, matching the native
                        # loader's every-frame-exactly-once semantics.
                        sel = rng.choice(fill, self.batch_size, replace=False)
                        batch = pool[sel].astype(np.float32)
                        keep_mask = np.ones(fill, dtype=bool)
                        keep_mask[sel] = False
                        keep = np.flatnonzero(keep_mask)
                        fill = keep.size
                        pool[:fill] = pool[keep]
                        yield batch
            if not self._repeat:
                # Drain the pool in batch_size chunks (shuffled), matching
                # the native loader: full batches, then one final partial.
                perm = rng.permutation(fill)
                for start in range(0, fill, self.batch_size):
                    yield pool[perm[start : start + self.batch_size]].astype(
                        np.float32
                    )
                return

    def close(self):
        if self._handle is not None:
            self._lib.qtz_loader_destroy(self._handle)
            self._handle = None
            self.native = False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
