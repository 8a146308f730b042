"""Tracing / profiling utilities.

Behavioral contract: the reference's record_function-based hooks
(torch_utils/misc.py:98-103, applied at upfirdn2d.py:168, bias_act.py:93,
conv2d_resample.py:58, training_stats.py:55) and print_module_summary
(misc.py:192-260) — TPU-native: jax.named_scope for trace annotation,
jax.profiler for timeline capture, and a pytree param summarizer.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable, Optional

import jax
import numpy as np


def profiled_function(fn: Callable) -> Callable:
    """Annotate a function in the XLA/profiler trace (misc.py:98)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


@contextlib.contextmanager
def record_function(name: str):
    """Named trace scope (the record_function('split_ws') pattern,
    w_s_converter.py:78)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/stylemc_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def count_params(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params)
               if hasattr(x, "shape"))


def print_params_summary(params, name: str = "params", max_depth: int = 2,
                         file=None) -> int:
    """Per-subtree parameter counts (print_module_summary analogue,
    misc.py:192-260)."""
    rows = [("name", "params", "shape-sample")]

    def walk(tree, prefix, depth):
        if depth >= max_depth or not isinstance(tree, dict):
            leaves = [x for x in jax.tree_util.tree_leaves(tree)
                      if hasattr(x, "shape")]
            n = sum(int(np.prod(x.shape)) for x in leaves)
            sample = str(leaves[0].shape) if leaves else "-"
            rows.append((prefix, str(n), sample))
            return
        for k in tree:
            walk(tree[k], f"{prefix}.{k}", depth + 1)

    walk(params, name, 0)
    total = count_params(params)
    rows.append(("TOTAL", str(total), ""))
    widths = [max(len(r[i]) for r in rows) for i in range(3)]
    for r in rows:
        print("  ".join(c.ljust(w) for c, w in zip(r, widths)), file=file)
    return total
