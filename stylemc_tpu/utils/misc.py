"""Small shared utilities (reference: utils.py:56-74, torch_utils/misc.py)."""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple


def num_range(s: str) -> List[int]:
    """'a-c' or 'a,b,c' → list of ints (reference utils.py:64-74)."""
    m = re.match(r"^(\d+)-(\d+)$", s)
    if m:
        return list(range(int(m.group(1)), int(m.group(2)) + 1))
    return [int(x) for x in s.split(",")]


def assert_shape(x, ref_shape: Sequence):
    """Shape assertion with None wildcards (reference torch_utils/misc.py:80)."""
    assert len(x.shape) == len(ref_shape), \
        f"rank mismatch: {x.shape} vs {ref_shape}"
    for dim, (got, want) in enumerate(zip(x.shape, ref_shape)):
        if want is not None and got != want:
            raise AssertionError(f"dim {dim}: {got} != {want} ({x.shape})")


def unravel_index(index: int, shape: Sequence[int]) -> Tuple[int, ...]:
    """reference utils.py:56-61."""
    out = []
    for dim in reversed(shape):
        out.append(index % dim)
        index //= dim
    return tuple(reversed(out))
