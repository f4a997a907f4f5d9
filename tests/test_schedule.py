"""LR schedule tests — golden behaviours vs the reference policies."""

import numpy as np
import pytest

from faceoff_tpu.train import schedule as S


class TestCycle:
    def test_endpoints_and_peak(self):
        lr_max, n = 1e-3, 1000
        fn = S.cycle_schedule(lr_max, n, divider=25, warmup_proportion=0.3)
        assert np.isclose(float(fn(0)), lr_max / 25, rtol=1e-4)
        assert np.isclose(float(fn(300)), lr_max, rtol=1e-2)
        # final lr anneals to lr_min/1e4 (reference scheduler.py:272)
        assert float(fn(999)) < lr_max / 1000

    def test_monotone_warmup(self):
        fn = S.cycle_schedule(1e-3, 100, warmup_proportion=0.5)
        vals = [float(fn(i)) for i in range(0, 50, 5)]
        assert all(b > a for a, b in zip(vals, vals[1:]))

    def test_momentum_mirror(self):
        fn = S.cycle_momentum_schedule(100, (0.95, 0.85), 0.5)
        assert np.isclose(float(fn(0)), 0.95, rtol=1e-4)
        assert np.isclose(float(fn(50)), 0.85, rtol=1e-2)
        assert np.isclose(float(fn(99)), 0.95, rtol=1e-2)


class TestOthers:
    def test_cosine_range(self):
        fn = S.cosine_lr(1e-5, 1e-3, 100)
        vals = np.array([float(fn(i)) for i in range(100)])
        assert vals.max() <= 1e-3 + 1e-9 and vals.min() >= 1e-5 - 1e-9
        assert np.isclose(float(fn(0)), 1e-3)

    def test_power_warmup_then_decay(self):
        fn = S.power_lr(1e-5, 1e-3, 10)
        assert float(fn(0)) == pytest.approx(1e-5)
        assert float(fn(10)) == pytest.approx(1e-3, rel=1e-3)
        assert float(fn(40)) < float(fn(20))

    def test_clr_triangle(self):
        fn = S.clr(0.0, 1.0, 10)
        assert float(fn(0)) == pytest.approx(0.0)
        assert float(fn(10)) == pytest.approx(1.0)
        assert float(fn(20)) == pytest.approx(0.0)

    def test_transformer_warmup_peak(self):
        fn = S.transformer_warmup(512, warmup=100)
        vals = [float(fn(i)) for i in [1, 50, 100, 200]]
        assert vals[2] == max(vals)

    def test_factory_flags(self):
        assert S.make_schedule("", 1e-3, 100) is None
        assert S.make_schedule("cycle", 1e-3, 100) is not None
        with pytest.raises(ValueError):
            S.make_schedule("bogus", 1e-3, 100)


def test_make_schedule_exposes_cycle_anneal_and_lr_finder():
    """All reference scheduler policies are reachable from the factory
    (reference scheduler.py:157-218 CycleAnnealScheduler, :323-346
    LRFinder)."""
    import numpy as np

    sa = S.make_schedule("cycle_anneal", 1e-3, 100)
    vals = np.array([float(sa(s)) for s in range(100)])
    assert vals.max() <= 1e-3 + 1e-9
    assert vals.argmax() > 10  # ramps up then down
    assert np.isfinite(vals).all()

    sf = S.make_schedule("lr_finder", 1e-3, 100)
    v0, v99 = float(sf(0)), float(sf(99))
    assert v0 < 2e-6 and v99 > 5e-4  # exponential sweep over ~3 decades


def test_cycle_injects_momentum_into_adam_b1():
    """`--sched cycle` must cycle Adam's b1 alongside the lr, as the
    reference CycleScheduler writes group['betas'] = (momentum, b2) every
    step (reference scheduler.py:275-316). Asserts the injected b1 hyperparam
    tracks cycle_momentum_schedule through real optimizer updates."""
    import jax.numpy as jnp

    from faceoff_tpu.train.state import make_optimizer

    n_iter, wp = 20, 0.3
    tx = make_optimizer(
        1e-3, sched_name="cycle", n_iter=n_iter, warmup_proportion=wp
    )
    ref_b1 = S.cycle_momentum_schedule(n_iter, (0.95, 0.85), wp)
    ref_lr = S.cycle_schedule(1e-3, n_iter, warmup_proportion=wp)

    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.1)}
    opt_state = tx.init(params)
    for step in range(12):
        _, opt_state = tx.update(grads, opt_state, params)
        # hyperparams hold the values USED by the update just applied
        assert float(opt_state.hyperparams["b1"]) == pytest.approx(
            float(ref_b1(step)), rel=1e-5
        )
        assert float(opt_state.hyperparams["learning_rate"]) == pytest.approx(
            float(ref_lr(step)), rel=1e-5
        )
    # b1 actually moved (0.95 -> toward 0.85 across the warmup)
    assert float(opt_state.hyperparams["b1"]) < 0.90


def test_plain_adam_b1_constant():
    """Without a schedule the optimizer keeps the fixed b1."""
    import jax.numpy as jnp

    from faceoff_tpu.train.state import make_optimizer

    tx = make_optimizer(1e-3)
    params = {"w": jnp.ones((2,))}
    opt_state = tx.init(params)
    for _ in range(3):
        _, opt_state = tx.update(
            {"w": jnp.full((2,), 0.1)}, opt_state, params
        )
    assert float(opt_state.hyperparams["b1"]) == pytest.approx(0.9)
