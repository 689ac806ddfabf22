"""Wall-clock phase timers (include/tictoc.h equivalent).

For device work, callers must pass already-synchronized points (e.g. after
jax.block_until_ready) — XLA dispatch is async.
"""

from __future__ import annotations

import time


class TicToc:
    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self._t0 = time.perf_counter()
        self.times: dict[str, float] = {}

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, label: str) -> float:
        dt = time.perf_counter() - self._t0
        self.times[label] = dt
        if self.verbose:
            print(f"{label} {dt:.6f} seconds")
        self._t0 = time.perf_counter()
        return dt
