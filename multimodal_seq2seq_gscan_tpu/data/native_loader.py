"""ctypes binding for the native gSCAN dataset loader (native/gscan_loader.cc).

The native scanner memory-maps dataset.txt, records string spans per example
and rasterizes dense situation grids in one pass (~10x faster than the
json.load path). Strings (commands, derivations, raw situation JSON) are
decoded lazily from the mapped file on the Python side.

Build with scripts/build_native.sh; ``is_available()`` is False otherwise and
callers fall back to the engine loader.
"""

import ctypes
import json
import os
from typing import Dict

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libgscan_loader.so")
_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gscan_open.restype = ctypes.c_void_p
    lib.gscan_open.argtypes = [ctypes.c_char_p]
    lib.gscan_error.restype = ctypes.c_char_p
    lib.gscan_error.argtypes = [ctypes.c_void_p]
    lib.gscan_grid_size.restype = ctypes.c_int
    lib.gscan_grid_size.argtypes = [ctypes.c_void_p]
    lib.gscan_channels.restype = ctypes.c_int
    lib.gscan_channels.argtypes = [ctypes.c_void_p]
    lib.gscan_split_size.restype = ctypes.c_int64
    lib.gscan_split_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.gscan_list_splits.restype = ctypes.c_int
    lib.gscan_list_splits.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
    lib.gscan_fill_split.restype = ctypes.c_int
    lib.gscan_fill_split.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.gscan_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def is_available() -> bool:
    return _load_library() is not None


class NativeSplit:
    """One split's examples: lazy strings + materialized grids/positions."""

    def __init__(self, data: bytes, offsets: np.ndarray, positions: np.ndarray,
                 grids: np.ndarray):
        self._data = data
        self.offsets = offsets      # [n, 8] int64
        self.positions = positions  # [n, 2] int32
        self.grids = grids          # [n, g, g, c] uint8

    def __len__(self) -> int:
        return self.offsets.shape[0]

    def _span(self, i: int, field: int) -> str:
        off = int(self.offsets[i, field * 2])
        length = int(self.offsets[i, field * 2 + 1])
        return self._data[off:off + length].decode("utf-8")

    def command(self, i: int) -> str:
        return self._span(i, 0)

    def derivation(self, i: int) -> str:
        return self._span(i, 1)

    def target_commands(self, i: int) -> str:
        return self._span(i, 2)

    def situation(self, i: int) -> dict:
        """Lazily json-decode the raw situation object."""
        return json.loads(self._span(i, 3))


class NativeDataset:
    """All splits of a dataset.txt, loaded via the native scanner."""

    def __init__(self, path: str):
        lib = _load_library()
        assert lib is not None, "native loader not built"
        handle = lib.gscan_open(path.encode())
        error = lib.gscan_error(handle)
        if error:
            message = error.decode()
            lib.gscan_close(handle)
            raise ValueError("native loader failed: {}".format(message))
        try:
            self.grid_size = lib.gscan_grid_size(handle)
            self.channels = lib.gscan_channels(handle)
            buffer = ctypes.create_string_buffer(4096)
            assert lib.gscan_list_splits(handle, buffer, 4096) >= 0
            split_names = [s for s in buffer.value.decode().split(",") if s]
            import mmap
            self._file = open(path, "rb")
            raw = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
            self.splits: Dict[str, NativeSplit] = {}
            for split in split_names:
                n = lib.gscan_split_size(handle, split.encode())
                offsets = np.zeros((n, 8), dtype=np.int64)
                positions = np.zeros((n, 2), dtype=np.int32)
                grids = np.zeros(
                    (n, self.grid_size, self.grid_size, self.channels),
                    dtype=np.uint8)
                if n > 0:
                    status = lib.gscan_fill_split(
                        handle, split.encode(),
                        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                        positions.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int32)),
                        grids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
                    assert status == 0
                self.splits[split] = NativeSplit(raw, offsets, positions,
                                                 grids)
        finally:
            lib.gscan_close(handle)

    def move_k_examples_to_train_and_dev(self, k: int, rng,
                                         split: str = "adverb_1"):
        """k-shot move at load time (reference dataset.py:499-514): k random
        examples of ``split`` are appended to train AND dev and removed."""
        if k <= 0 or split not in self.splits or "train" not in self.splits:
            return
        source = self.splits[split]
        n = len(source)
        chosen = rng.sample(range(n), k=min(k, n))
        chosen_set = set(chosen)
        keep = [i for i in range(n) if i not in chosen_set]

        def take(native_split, indices):
            return (native_split.offsets[indices],
                    native_split.positions[indices],
                    native_split.grids[indices])

        for destination in ("train", "dev"):
            if destination not in self.splits:
                continue
            dest = self.splits[destination]
            off, pos, grids = take(source, chosen)
            self.splits[destination] = NativeSplit(
                dest._data,
                np.concatenate([dest.offsets, off]),
                np.concatenate([dest.positions, pos]),
                np.concatenate([dest.grids, grids]))
        off, pos, grids = take(source, keep)
        self.splits[split] = NativeSplit(source._data, off, pos, grids)
