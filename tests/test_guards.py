"""NaN-guard utilities (reference check_loss / check_nan equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.infra import guards


def test_check_loss():
    guards.check_loss(jnp.asarray(0.5))
    with pytest.raises(ValueError):
        guards.check_loss(jnp.asarray(float("nan")))


def test_check_tree_finite_names_bad_leaf():
    with pytest.raises(ValueError, match="bad"):
        guards.check_tree_finite({"bad": jnp.asarray([jnp.inf])}, name="params")
    guards.check_tree_finite({"ok": jnp.ones(3), "ints": jnp.arange(3)})


def test_finite_or_debug_under_jit():
    f = jax.jit(lambda x: guards.finite_or_debug(x + 1, "stage"))
    np.testing.assert_allclose(np.asarray(f(jnp.ones(2))), 2.0)
    # non-finite input still flows through (guard only reports)
    out = f(jnp.asarray([jnp.nan, 1.0]))
    assert np.isnan(np.asarray(out)[0])


def test_checkify_step():
    err, out = guards.checkify_step(lambda x: jnp.log(x))(jnp.asarray(-1.0))
    assert bool(err.get())
    err2, out2 = guards.checkify_step(lambda x: x * 2)(jnp.asarray(3.0))
    assert not bool(err2.get())
    assert float(out2) == 6.0


def test_guard_metrics():
    m = guards.guard_metrics({"a": jnp.asarray(jnp.nan), "b": jnp.asarray(1.0)})
    assert float(m["a"]) == -1.0 and float(m["b"]) == 1.0
