"""Space-to-depth stem = exact rewrite of the 6x6/s2 stem conv."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_cib_tpu.models.layers import ConvBnAct, SpaceToDepthStem
from object_detection_cib_tpu.models.yolov5 import Yolov5Backbone


def test_stem_equivalence_same_params():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    direct = ConvBnAct(32, 6, 2, padding=2)
    s2d = SpaceToDepthStem(32)
    v = direct.init(jax.random.PRNGKey(1), x, train=False)
    # identical param tree -> reuse directly
    y1 = direct.apply(v, x, train=False)
    y2 = s2d.apply(v, x, train=False)
    assert y1.shape == y2.shape == (2, 32, 32, 32)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)


def test_stem_equivalence_train_mode_and_grads():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    direct = ConvBnAct(32, 6, 2, padding=2)
    s2d = SpaceToDepthStem(32)
    v = direct.init(jax.random.PRNGKey(1), x, train=False)

    def loss(mod, p):
        out, _ = mod.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
            mutable=["batch_stats"],
        )
        return (out**2).mean()

    g1 = jax.grad(lambda p: loss(direct, p))(v["params"])
    g2 = jax.grad(lambda p: loss(s2d, p))(v["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_backbone_param_tree_unchanged():
    x = jnp.zeros((1, 64, 64, 3))
    for flag in [True, False]:
        bb = Yolov5Backbone(
            deepen_factor=0.33, widen_factor=0.25, stem_space_to_depth=flag
        )
        v = bb.init(jax.random.PRNGKey(0), x, train=False)
        assert v["params"]["stem"]["conv"]["kernel"].shape == (6, 6, 3, 16)
