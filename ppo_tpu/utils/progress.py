"""Iteration progress bar — the libs/tqdm analogue (SURVEY §2.4 timing row).

The reference wraps its iteration loop in a tqdm progress bar on rank 0
(ac_ppo_continuous_action.cpp:624; libs/tqdm). Here: a real tqdm bar when the
package is importable AND stderr is a TTY (interactive use); campaign logs and
CI keep the clean per-iteration prints without bar control characters.
"""

from __future__ import annotations

import sys


def progress_range(start: int, stop: int, enabled: bool = True, desc: str = "iter"):
    """range(start, stop) wrapped in tqdm when interactive; plain otherwise."""
    r = range(start, stop)
    if not enabled or not sys.stderr.isatty():
        return r
    try:
        from tqdm import tqdm
    except ImportError:
        return r
    return tqdm(r, desc=desc, unit="it", dynamic_ncols=True)
