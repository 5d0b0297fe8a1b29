"""Static stripe masks for the gauge-equivariant coupling layers.

Capability parity with reference fthmc/utils/layers.py:213-292
(make_2d_link_active_stripes / make_single_stripes / make_double_stripes /
make_plaq_masks). Masks are host-side numpy constants baked into the jitted
program at trace time, cached per (lattice shape, mu, off); they carry no
parameters, which is what makes trained flows lattice-size polymorphic
(volume transfer).

The 4-phase masking scheme per coupling layer i (mu = i % 2, off = (i//2) % 4,
reference layers.py:409-411):
  - link "active" mask: 1-in-4 columns of mu-oriented links (the links updated)
  - plaq "active":  single stripes  (plaquettes actually transformed)
  - plaq "frozen":  double stripes at off+1 (conditioning input to the CNN)
  - plaq "passive": the rest (carried through unchanged)
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["link_active_stripes", "single_stripes", "double_stripes",
           "plaq_masks", "layer_mask_params"]


def layer_mask_params(i: int) -> tuple[int, int]:
    """(mu, off) cycling for coupling layer index i (reference layers.py:409)."""
    return i % 2, (i // 2) % 4


@lru_cache(maxsize=None)
def link_active_stripes(shape: tuple[int, int, int], mu: int, off: int) -> np.ndarray:
    """Active-link mask, shape (2, L0, L1): 1-in-4 stripes of mu-links.

    For mu=0 the stripes run along axis 1 (the mu direction) and repeat every
    4 in axis 2; for mu=1, vice versa. Offset rolls the pattern along the
    perpendicular (nu) axis. The non-mu channel is identically 0.
    (reference layers.py:213-237)
    """
    assert len(shape) == 3 and shape[0] == 2 and mu in (0, 1)
    mask = np.zeros(shape, dtype=np.float32)
    if mu == 0:
        mask[0, :, 0::4] = 1.0
    else:
        mask[1, 0::4, :] = 1.0
    nu = 1 - mu
    mask = np.roll(mask, off, axis=nu + 1)
    mask.setflags(write=False)
    return mask


@lru_cache(maxsize=None)
def single_stripes(shape: tuple[int, int], mu: int, off: int) -> np.ndarray:
    """Single-stripe plaquette mask (2D), period 4 perpendicular to mu.
    (reference layers.py:240-259)"""
    assert len(shape) == 2 and mu in (0, 1)
    mask = np.zeros(shape, dtype=np.float32)
    if mu == 0:
        mask[:, 0::4] = 1.0
    else:
        mask[0::4, :] = 1.0
    mask = np.roll(mask, off, axis=1 - mu)
    mask.setflags(write=False)
    return mask


@lru_cache(maxsize=None)
def double_stripes(shape: tuple[int, int], mu: int, off: int) -> np.ndarray:
    """Double-stripe plaquette mask (2D). (reference layers.py:261-284)"""
    assert len(shape) == 2 and mu in (0, 1)
    mask = np.zeros(shape, dtype=np.float32)
    if mu == 0:
        mask[:, 0::4] = 1.0
        mask[:, 1::4] = 1.0
    else:
        mask[0::4, :] = 1.0
        mask[1::4, :] = 1.0
    mask = np.roll(mask, off, axis=1 - mu)
    mask.setflags(write=False)
    return mask


@lru_cache(maxsize=None)
def plaq_masks(shape: tuple[int, int], mu: int, off: int):
    """(frozen, active, passive) plaquette masks; a disjoint partition of the
    lattice (frozen at off+1). (reference layers.py:287-292)"""
    frozen = double_stripes(shape, mu, off + 1)
    active = single_stripes(shape, mu, off)
    passive = 1.0 - frozen - active
    passive.setflags(write=False)
    return frozen, active, passive
