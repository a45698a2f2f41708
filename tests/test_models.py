"""Model-library tests: param-count parity, shapes, prior-bias init.

Golden param counts were verified against the reference architecture
definition (kod/nn/networks/yolov5.py stage table + scaling): the numbers
coincide with upstream YOLOv5 n/s (1.87M / 7.24M at 80 classes).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_cib_tpu.models.yolov5 import (
    SIZE_VARIANTS,
    build_network,
    make_divisible,
    make_round,
)

GOLDEN_PARAM_COUNTS = {
    ("n", 80): 1_872_157,
    ("n", 10): 1_777_447,
    ("s", 80): 7_235_389,
    ("s", 10): 7_046_599,
    # m/l match upstream YOLOv5 (21.2M / 46.5M)
    ("m", 80): 21_190_557,
    ("l", 80): 46_563_709,
}


def _init(net, img=64, batch=1):
    return net.init(jax.random.PRNGKey(0), jnp.zeros((batch, img, img, 3)), train=False)


def _param_count(variables):
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))


@pytest.mark.parametrize("size,nc", list(GOLDEN_PARAM_COUNTS))
def test_param_count_parity(size, nc):
    # eval_shape: parameter COUNTS only need shapes — tracing skips the
    # init computation entirely (the m/l variants cost ~20 s each to
    # actually initialize on the 1-core CI host; fast-tier budget)
    net = build_network(nc, size)
    shapes = jax.eval_shape(
        lambda k: net.init(k, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0),
    )
    assert _param_count(shapes) == GOLDEN_PARAM_COUNTS[(size, nc)]


def test_output_shapes():
    net = build_network(10, "n")
    variables = _init(net, img=64, batch=2)
    out = net.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    # strides 8/16/32 -> 8x8, 4x4, 2x2
    assert out.ll.box.shape == (2, 8, 8, 3, 4)
    assert out.ml.obj.shape == (2, 4, 4, 3, 1)
    assert out.hl.cls.shape == (2, 2, 2, 3, 10)


def test_head_prior_bias():
    net = build_network(10, "n")
    variables = _init(net)
    p = variables["params"]
    # obj bias centered at log(8/(640/stride)^2) (ref heads/yolov5.py:114)
    for name, stride in [("ll_head", 8), ("ml_head", 16), ("hl_head", 32)]:
        bias = np.asarray(p[name]["obj_bias"])
        expect = math.log(8.0 / (640.0 / stride) ** 2)
        assert abs(bias.mean() - expect) < 0.2, (name, bias.mean(), expect)
    # cls bias centered at log(0.6/(nc-0.99999)) (ref heads/yolov5.py:66)
    cls_bias = np.asarray(p["ll_head"]["cls_bias"])
    assert abs(cls_bias.mean() - math.log(0.6 / (10 - 0.99999))) < 0.2


def test_batchnorm_stats_update():
    net = build_network(10, "n")
    variables = _init(net)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _, mutated = net.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed


def test_make_divisible_round():
    # ref kod/nn/utils.py semantics
    assert make_divisible(64, 0.25) == 16
    assert make_divisible(1024, 0.50) == 512
    assert make_divisible(100, 1.0) == 104  # ceil to multiple of 8
    assert make_round(3, 0.33) == 1
    assert make_round(9, 0.33) == 3
    assert make_round(1, 0.1) == 1


def test_size_variants_registry():
    assert SIZE_VARIANTS["s"] == dict(deepen_factor=0.33, widen_factor=0.50)
    assert SIZE_VARIANTS["n"] == dict(deepen_factor=0.33, widen_factor=0.25)
