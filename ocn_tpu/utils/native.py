"""Loader for the native C++ host-runtime library (libgraphcore).

The reference delegates its host/runtime-side sparse machinery to native
extensions (torch_sparse / torch_scatter C++, reference environment.yml:247-248).
The TPU build's analogue is ``native/graphcore.cpp``: CSR construction,
edge->nnz position maps and negative sampling over multi-million-edge graphs,
compiled to a plain shared library and bound via ctypes (no pybind11 in the
image).  Everything has a NumPy fallback, so the framework works without the
library; `load()` returns None when it is absent.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


class _GraphCore:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.gc_csr_from_edges.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i32p, i32p]
        lib.gc_csr_from_edges.restype = None
        lib.gc_edge_positions.argtypes = [i32p, i32p, ctypes.c_int64, i64p, ctypes.c_int64, i32p]
        lib.gc_edge_positions.restype = None
        lib.gc_negative_sampling.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, i64p]
        lib.gc_negative_sampling.restype = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.gc_adj2_csr.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, i32p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.gc_adj2_csr.restype = None
        self._has_spgemm = hasattr(lib, "gc_spgemm_csr")
        if self._has_spgemm:
            lib.gc_spgemm_csr.argtypes = [
                i32p, i32p, ctypes.c_void_p, i32p, i32p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, i32p,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.gc_spgemm_csr.restype = None
        self._f32p = f32p

    def csr_from_edges(self, edge_index: np.ndarray, n_nodes: int):
        ei = np.ascontiguousarray(edge_index, np.int64)
        nnz = ei.shape[1]
        indptr = np.zeros(n_nodes + 1, np.int32)
        col = np.zeros(nnz, np.int32)
        self._lib.gc_csr_from_edges(ei, nnz, n_nodes, indptr, col)
        return indptr, col

    def edge_to_nnz_positions(self, indptr, col, edges):
        indptr = np.ascontiguousarray(indptr, np.int32)
        col = np.ascontiguousarray(col, np.int32)
        edges = np.ascontiguousarray(edges, np.int64)
        ne = edges.shape[1]
        out = np.zeros((ne, 2), np.int32)
        self._lib.gc_edge_positions(indptr, col, col.shape[0], edges, ne, out)
        return out

    def adj2_csr(self, indptr: np.ndarray, col: np.ndarray, n_nodes: int,
                 cap: int = 1024):
        """Row-capped A^2 CSR (see native/graphcore.cpp gc_adj2_csr)."""
        indptr = np.ascontiguousarray(indptr, np.int32)
        col = np.ascontiguousarray(col, np.int32)
        out_indptr = np.zeros(n_nodes + 1, np.int32)
        self._lib.gc_adj2_csr(indptr, col, n_nodes, cap, out_indptr, None, None)
        nnz = int(out_indptr[n_nodes])
        out_col = np.zeros(nnz, np.int32)
        out_val = np.zeros(nnz, np.float32)
        self._lib.gc_adj2_csr(
            indptr, col, n_nodes, cap, out_indptr,
            out_col.ctypes.data_as(ctypes.c_void_p),
            out_val.ctypes.data_as(ctypes.c_void_p),
        )
        return out_indptr, out_col, out_val

    def spgemm_csr(self, ip_a, col_a, val_a, ip_b, col_b, val_b,
                   n_nodes: int, cap: int = 1024):
        """Row-capped weighted C = A @ B CSR (native gc_spgemm_csr); val_a /
        val_b may be None for all-ones.  Returns None if the loaded library
        predates the symbol (rebuild with `make -C native`)."""
        if not self._has_spgemm:
            return None
        ip_a = np.ascontiguousarray(ip_a, np.int32)
        col_a = np.ascontiguousarray(col_a, np.int32)
        ip_b = np.ascontiguousarray(ip_b, np.int32)
        col_b = np.ascontiguousarray(col_b, np.int32)

        # keep the contiguous copies alive for the duration of both calls
        va_arr = None if val_a is None else np.ascontiguousarray(val_a, np.float32)
        vb_arr = None if val_b is None else np.ascontiguousarray(val_b, np.float32)
        va = None if va_arr is None else va_arr.ctypes.data_as(ctypes.c_void_p)
        vb = None if vb_arr is None else vb_arr.ctypes.data_as(ctypes.c_void_p)
        out_indptr = np.zeros(n_nodes + 1, np.int32)
        self._lib.gc_spgemm_csr(
            ip_a, col_a, va, ip_b, col_b, vb, n_nodes, cap, out_indptr,
            None, None)
        nnz = int(out_indptr[n_nodes])
        out_col = np.zeros(nnz, np.int32)
        out_val = np.zeros(nnz, np.float32)
        self._lib.gc_spgemm_csr(
            ip_a, col_a, va, ip_b, col_b, vb, n_nodes, cap, out_indptr,
            out_col.ctypes.data_as(ctypes.c_void_p),
            out_val.ctypes.data_as(ctypes.c_void_p))
        return out_indptr, out_col, out_val

    def negative_sampling(self, sorted_keys: np.ndarray, n_nodes: int, num: int, seed: int):
        sorted_keys = np.ascontiguousarray(sorted_keys, np.int64)
        out = np.zeros(num, np.int64)
        got = self._lib.gc_negative_sampling(
            sorted_keys, sorted_keys.shape[0], n_nodes, num, np.uint64(seed), out)
        return out[:got]


def load() -> Optional[_GraphCore]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libgraphcore.so")
    if os.environ.get("OCN_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(path):
        # .so is a build artifact (gitignored); build it on first use so a
        # fresh checkout never silently falls into the slow NumPy fallbacks
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", os.path.join(here, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            pass
    if os.path.exists(path):
        try:
            _LIB = _GraphCore(ctypes.CDLL(path))
        except OSError:
            _LIB = None
    return _LIB
