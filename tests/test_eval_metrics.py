"""Diversity / vertex metrics / condition exchange tests."""

import jax
import jax.numpy as jnp
import numpy as np

from avi_talking_tpu.train.eval_metrics import (
    condition_exchange,
    lip_vertex_error,
    style_diversity,
    vertex_l2,
)


def test_style_diversity():
    same = jnp.ones((5, 8))
    assert float(style_diversity(same)) < 1e-5
    embs = jnp.asarray(np.eye(4, 8, dtype=np.float32) * 2)
    d = float(style_diversity(embs))
    # pairwise distance between distinct rows of 2*I is 2*sqrt(2)
    np.testing.assert_allclose(d, 2 * np.sqrt(2), rtol=1e-5)


def test_vertex_metrics():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((2, 5, 10, 3)).astype(np.float32))
    pred = gt + 0.1
    err = float(vertex_l2(pred, gt))
    np.testing.assert_allclose(err, np.sqrt(3 * 0.01), rtol=1e-4)
    mask = jnp.asarray(np.arange(10) < 5)
    lve = float(lip_vertex_error(pred, gt, mask))
    np.testing.assert_allclose(lve, np.sqrt(3 * 0.01), rtol=1e-4)


def test_condition_exchange():
    batch = {
        "raw_audio": jnp.arange(4.0)[:, None],
        "expression": jnp.asarray(np.eye(4, dtype=np.float32)),
    }
    out, perm = condition_exchange(batch, jax.random.PRNGKey(0))
    assert out["raw_audio"].shape == (8, 1)
    # first half identical, second half audio duplicated but expression permuted
    np.testing.assert_allclose(np.asarray(out["raw_audio"][:4]),
                               np.asarray(batch["raw_audio"]))
    np.testing.assert_allclose(np.asarray(out["raw_audio"][4:]),
                               np.asarray(batch["raw_audio"]))
    np.testing.assert_allclose(
        np.asarray(out["expression"][4:]),
        np.asarray(batch["expression"])[np.asarray(perm)],
    )


def test_condition_exchange_is_derangement():
    """Reference asserts the exchanged conditions differ EVERYWHERE
    (FaceFormer.py:252-253); a fixed point silently degrades the
    disentangled loss to the plain one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avi_talking_tpu.train.eval_metrics import condition_exchange

    for B in (2, 3, 4, 7):
        for seed in range(20):
            batch = {"raw": jnp.arange(B, dtype=jnp.float32),
                     "expression": jnp.arange(B)}
            out, perm = condition_exchange(batch, jax.random.PRNGKey(seed))
            p = np.asarray(perm)
            assert sorted(p.tolist()) == list(range(B))
            assert (p != np.arange(B)).all(), (B, seed, p)
            np.testing.assert_array_equal(
                np.asarray(out["expression"][B:]), np.arange(B)[p]
            )
            np.testing.assert_array_equal(np.asarray(out["raw"][B:]),
                                          np.arange(B, dtype=np.float32))
