"""Mask-system tests: coverage, disjointness, geometry (SURVEY.md section 4)."""
import numpy as np

from fthmc_tpu.models.masks import (double_stripes, layer_mask_params,
                                    link_active_stripes, plaq_masks,
                                    single_stripes)


def test_plaq_masks_partition_unity():
    for mu in (0, 1):
        for off in range(4):
            frozen, active, passive = plaq_masks((8, 8), mu, off)
            total = frozen + active + passive
            np.testing.assert_array_equal(total, np.ones((8, 8)))
            # pairwise disjoint
            assert np.max(frozen * active) == 0
            assert np.max(frozen * passive) == 0
            assert np.max(active * passive) == 0


def test_stripe_counts():
    s = single_stripes((8, 8), 0, 0)
    assert s.sum() == 8 * 2          # every 4th column of 8
    d = double_stripes((8, 8), 0, 0)
    assert d.sum() == 8 * 4


def test_single_stripe_geometry():
    s = single_stripes((8, 8), 0, 1)
    # mu=0: stripes along axis 0, repeating every 4 in axis 1, offset 1
    assert np.array_equal(np.nonzero(s[0])[0], np.array([1, 5]))
    s1 = single_stripes((8, 8), 1, 2)
    # mu=1: stripes along axis 1, repeating every 4 in axis 0, offset 2
    assert np.array_equal(np.nonzero(s1[:, 0])[0], np.array([2, 6]))


def test_link_mask_other_channel_zero():
    for mu in (0, 1):
        m = link_active_stripes((2, 8, 8), mu, 3)
        assert m[1 - mu].sum() == 0
        assert m[mu].sum() == 8 * 2


def test_active_links_border_active_plaqs():
    """Each active mu-link must be a side of exactly one active plaquette
    (the lift delta_links = (dP, -dP) assumes this pairing)."""
    mu, off = 0, 0
    link = link_active_stripes((2, 8, 8), mu, off)
    _, active, _ = plaq_masks((8, 8), mu, off)
    # for mu=0: the active links sit on the active plaquette columns
    assert np.array_equal(link[0], active)


def test_layer_cycling():
    assert [layer_mask_params(i) for i in range(10)] == [
        (0, 0), (1, 0), (0, 1), (1, 1), (0, 2), (1, 2), (0, 3), (1, 3),
        (0, 0), (1, 0)]


def test_masks_immutable_cached():
    a = single_stripes((8, 8), 0, 0)
    b = single_stripes((8, 8), 0, 0)
    assert a is b
    assert not a.flags.writeable
