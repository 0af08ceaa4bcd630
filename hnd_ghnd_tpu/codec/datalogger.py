"""DataLogger: bottleneck payload-size bookkeeping for the cost analyzer.

Parity surface: src/structure/transformer.py DataLogger (:58-91) + the
myutils ``get_binary_object_size`` convention (pickled size in KB).  Records,
per image, the serialized size of the bottleneck tensor at fp32 / fp16 /
8-bit-quantized precision plus its shape — the numbers behind the
communication-delay tables in cost_analyzer.
"""
from __future__ import annotations

import pickle
from typing import List, Optional, Tuple

import numpy as np

from hnd_ghnd_tpu.codec.quantizer import quantize_tensor


def binary_object_size_kb(obj) -> float:
    """Pickled size in KB (myutils file_util.get_binary_object_size)."""
    return len(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)) / 1024.0


class DataLogger:
    def __init__(self, num_bits: int = 8):
        self.num_bits4quant = num_bits
        self.data_size_list: List[float] = []
        self.fp16_data_size_list: List[float] = []
        self.quantized_data_size_list: List[float] = []
        self.tensor_shape_list: List[Tuple[int, int, int]] = []

    def clear(self) -> None:
        self.data_size_list.clear()
        self.fp16_data_size_list.clear()
        self.quantized_data_size_list.clear()
        self.tensor_shape_list.clear()

    def get_data(self):
        return (self.data_size_list.copy(), self.fp16_data_size_list.copy(),
                self.quantized_data_size_list.copy(),
                self.tensor_shape_list.copy())

    def __call__(self, z: Optional[np.ndarray], target=None):
        """z: [1, H, W, C] float32 bottleneck tensor (None = ext-filtered)."""
        if z is None:
            self.data_size_list.append(0.0)
            self.fp16_data_size_list.append(0.0)
            self.quantized_data_size_list.append(0.0)
            self.tensor_shape_list.append((0, 0, 0))
            return z, target
        z = np.asarray(z, dtype=np.float32)
        self.data_size_list.append(binary_object_size_kb(z))
        self.fp16_data_size_list.append(
            binary_object_size_kb(z.astype(np.float16)))
        import jax.numpy as jnp
        q = quantize_tensor(jnp.asarray(z), self.num_bits4quant)
        self.quantized_data_size_list.append(binary_object_size_kb(
            (np.asarray(q.tensor), float(q.scale), float(q.zero_point))))
        # (C, H, W) like the reference's shape log (transformer.py:89-90)
        self.tensor_shape_list.append((z.shape[-1], z.shape[1], z.shape[2]))
        return z, target
