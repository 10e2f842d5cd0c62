"""Native (C) data-loader bindings with transparent NumPy fallback.

The reference implements its whole data layer in C99 (reference:
src/phyc/sequenceio.c, sitepattern.c, sequence.c); here the equivalent
host-side hot paths — FASTA parsing, sequence encoding, alignment-column
pattern compression — live in ``loader.c``, compiled on first use into a
shared library and bound via ctypes (no pybind11 in the image). If no C
compiler is available the pure-NumPy implementations take over; results are
bit-identical either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.c")
_LIB_NAME = "_native_loader.so"

_lib = None
_tried = False


def _build_library() -> str | None:
    out = os.path.join(_HERE, _LIB_NAME)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    for cc in ("cc", "gcc", "clang"):
        try:
            target = out
            try:
                fd = os.open(target + ".tmp", os.O_WRONLY | os.O_CREAT, 0o644)
                os.close(fd)
            except OSError:
                # package dir not writable -> cache dir
                cache = os.path.join(
                    tempfile.gettempdir(), "physher_tpu_native")
                os.makedirs(cache, exist_ok=True)
                target = os.path.join(cache, _LIB_NAME)
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", target + ".tmp"],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                os.replace(target + ".tmp", target)
                return target
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("PHYSHER_TPU_NO_NATIVE"):
        return None
    path = _build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    c_i64 = ctypes.c_int64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = ctypes.POINTER(c_i64)

    lib.encode_sequence.argtypes = [ctypes.c_char_p, c_i64, u8p, u8p]
    lib.fasta_scan.argtypes = [ctypes.c_char_p, c_i64, i64p, i64p]
    lib.fasta_parse.argtypes = [ctypes.c_char_p, c_i64, u8p, c_i64,
                                ctypes.c_char_p, c_i64, u8p, i64p]
    lib.fasta_parse.restype = c_i64
    lib.compress_patterns.argtypes = [u8p, c_i64, c_i64, i32p, f64p, i32p]
    lib.compress_patterns.restype = c_i64
    lib.gather_patterns.argtypes = [u8p, c_i64, c_i64, i32p, c_i64, u8p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def encode_sequence(seq: str, table: np.ndarray) -> np.ndarray:
    """Encode a sequence string through a 256-entry uint8 code table."""
    lib = _load()
    raw = seq.encode()
    out = np.empty(len(raw), dtype=np.uint8)
    if lib is not None:
        lib.encode_sequence(raw, len(raw), np.ascontiguousarray(table), out)
        return out
    return table[np.frombuffer(raw, dtype=np.uint8)]


def parse_fasta_encoded(text: str, table: np.ndarray):
    """Parse FASTA into (names, enc [T, L] uint8). Requires equal lengths
    (alignment); raises on ragged input."""
    lib = _load()
    raw = text.encode()
    if lib is not None:
        n_seqs = ctypes.c_int64()
        max_len = ctypes.c_int64()
        lib.fasta_scan(raw, len(raw), ctypes.byref(n_seqs),
                       ctypes.byref(max_len))
        T, L = n_seqs.value, max_len.value
        if T == 0:
            return [], np.zeros((0, 0), dtype=np.uint8)
        enc = np.full((T, L), 0xFF, dtype=np.uint8)
        lengths = (ctypes.c_int64 * T)()
        names_buf = ctypes.create_string_buffer(len(raw) + 2)
        lib.fasta_parse(raw, len(raw), np.ascontiguousarray(table), L,
                        names_buf, len(raw) + 1, enc, lengths)
        names = [n.split()[0] for n in
                 names_buf.raw.split(b"\0")[:T] if n]
        names = [n.decode() for n in names]
        lens = set(lengths[:T])
        if len(lens) != 1:
            raise ValueError(f"ragged alignment lengths: {sorted(lens)}")
        return names, enc
    # numpy fallback via the pure-python reader
    from ..io.seqio import read_fasta
    seqs = read_fasta(text)
    names = list(seqs)
    enc = np.stack([encode_sequence(seqs[n], table) for n in names]) \
        if names else np.zeros((0, 0), dtype=np.uint8)
    return names, enc


def compress_patterns(enc: np.ndarray):
    """Unique alignment columns: returns (codes [T, P], weights [P],
    indexes [L]) matching SitePattern.compress semantics (first-occurrence
    order)."""
    enc = np.ascontiguousarray(enc, dtype=np.uint8)
    T, L = enc.shape
    lib = _load()
    if lib is not None and L > 0:
        indexes = np.empty(L, dtype=np.int32)
        weights = np.empty(L, dtype=np.float64)
        first = np.empty(L, dtype=np.int32)
        n_pat = lib.compress_patterns(enc, T, L, indexes, weights, first)
        if n_pat >= 0:
            codes = np.empty((T, n_pat), dtype=np.uint8)
            lib.gather_patterns(enc, T, L, first, n_pat, codes)
            return codes, weights[:n_pat].copy(), indexes
    # numpy fallback
    cols = enc.T
    uniq, first_idx, inverse, counts = np.unique(
        cols, axis=0, return_index=True, return_inverse=True,
        return_counts=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return (uniq[order].T.astype(np.uint8), counts[order].astype(np.float64),
            rank[inverse].astype(np.int32))
