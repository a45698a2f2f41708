"""SmartSGD parity tests vs torch.optim.SGD + warmup/schedule golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from object_detection_cib_tpu.train.optim import (
    GROUP_BIAS,
    GROUP_DECAY,
    GROUP_NORM,
    OptimizerConfig,
    SmartSGD,
    WarmupParams,
    group_params,
    make_schedule,
)


def test_group_labels():
    params = {
        "backbone": {
            "conv": {"kernel": jnp.zeros((3, 3, 4, 8))},
            "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        },
        "head": {"obj": {"kernel": jnp.zeros((1, 1, 8, 3)), "bias": jnp.zeros(3)}},
    }
    g = group_params(params)
    assert g["backbone"]["conv"]["kernel"] == GROUP_DECAY
    assert g["backbone"]["bn"]["scale"] == GROUP_NORM
    assert g["backbone"]["bn"]["bias"] == GROUP_BIAS
    assert g["head"]["obj"]["bias"] == GROUP_BIAS


def test_sgd_matches_torch_no_warmup():
    """Decay-group trajectory must match torch SGD(nesterov, coupled wd)."""
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)

    cfg = OptimizerConfig(
        lr0=0.01,
        momentum=0.9,
        nesterov=True,
        weight_decay=5e-4,
        schedule="linear",
        lrf=1.0,  # constant schedule for clean comparison
        max_epochs=10,
        warmup=None,
    )
    opt = SmartSGD(cfg, steps_per_epoch=1000)
    params = {"layer": {"kernel": jnp.asarray(w0)}}
    state = opt.init(params)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD(
        [tw], lr=0.01, momentum=0.9, nesterov=True, weight_decay=5e-4
    )

    for step in range(5):
        g = rng.normal(size=w0.shape).astype(np.float32)
        params, state = opt.update(
            {"layer": {"kernel": jnp.asarray(g)}}, state, params, jnp.asarray(step)
        )
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), tw.detach().numpy(), atol=1e-5
    )


def test_bias_group_no_decay():
    cfg = OptimizerConfig(lr0=0.1, momentum=0.0, nesterov=False, weight_decay=0.5,
                          lrf=1.0, warmup=None)
    opt = SmartSGD(cfg, steps_per_epoch=10)
    params = {"m": {"bias": jnp.ones(3), "kernel": jnp.ones((2, 3))}}
    state = opt.init(params)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    new_params, _ = opt.update(zero_g, state, params, jnp.asarray(0))
    # bias: no decay, zero grad -> unchanged
    np.testing.assert_allclose(np.asarray(new_params["m"]["bias"]), 1.0)
    # kernel: decay 0.5, lr 0.1 -> w - 0.1*0.5*w = 0.95
    np.testing.assert_allclose(np.asarray(new_params["m"]["kernel"]), 0.95)


def test_schedules_golden():
    lin = make_schedule("linear", 300, 0.01)
    assert float(lin(0.0)) == pytest.approx(1.0)
    assert float(lin(300.0)) == pytest.approx(0.01)
    assert float(lin(150.0)) == pytest.approx((1 - 0.5) * 0.99 + 0.01)
    cos = make_schedule("cosine", 300, 0.01)
    assert float(cos(0.0)) == pytest.approx(1.0)
    assert float(cos(300.0)) == pytest.approx(0.01, abs=1e-6)
    ca = make_schedule("cosine_annealing", 300, 0.01)
    assert float(ca(0.0)) == pytest.approx(1.0)
    assert float(ca(300.0)) == pytest.approx(0.01, abs=1e-6)
    st = make_schedule("step", 300, step_size=100, gamma=0.5)
    assert float(st(250.0)) == pytest.approx(0.25)


def test_warmup_interp():
    cfg = OptimizerConfig(
        lr0=0.01, schedule="linear", lrf=0.01, max_epochs=300,
        warmup=WarmupParams(3.0, 0.1, 0.8),
    )
    opt = SmartSGD(cfg, steps_per_epoch=100)
    assert opt.nw == 300  # max(round(100*3), 100)

    lr_b, lr_o, mom = opt.hyperparams(jnp.asarray(0))
    assert float(lr_b) == pytest.approx(0.1)
    assert float(lr_o) == pytest.approx(0.0)
    assert float(mom) == pytest.approx(0.8)

    lr_b, lr_o, mom = opt.hyperparams(jnp.asarray(300))
    # at nw: epoch = 3, lr = lr0 * sch(3)
    expect = 0.01 * ((1 - 3 / 300) * 0.99 + 0.01)
    assert float(lr_b) == pytest.approx(expect, rel=1e-5)
    assert float(lr_o) == pytest.approx(expect, rel=1e-5)
    assert float(mom) == pytest.approx(0.937)

    # well past warmup: pure schedule
    lr_b, lr_o, mom = opt.hyperparams(jnp.asarray(100 * 150))
    expect = 0.01 * ((1 - 150 / 300) * 0.99 + 0.01)
    assert float(lr_o) == pytest.approx(expect, rel=1e-5)
    assert float(mom) == pytest.approx(0.937)


def test_nw_floor_100():
    cfg = OptimizerConfig(warmup=WarmupParams(3.0, 0.1, 0.8))
    opt = SmartSGD(cfg, steps_per_epoch=10)
    assert opt.nw == 100  # max(30, 100) (ref exp.py:167-173)
