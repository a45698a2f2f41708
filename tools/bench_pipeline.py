import time, numpy as np, jax, jax.numpy as jnp
import os
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from object_detection_cib_tpu.data.device_pipeline import build_device_augment_fn, DeviceSample
from object_detection_cib_tpu.data.host_augment import AugParams

S, B, T = 416, 64, 30
ap = AugParams()
fn = build_device_augment_fn(S, ap, 0.0, 120, True)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0,256,(4*B,S,S,3),dtype=np.uint8))
sizes = jnp.full((4*B,2), S, jnp.int32)
boxes = jnp.asarray(rng.uniform(0,S,(4*B,T,4)).astype(np.float32))
boxes = boxes.at[...,2:].add(20)
labels = jnp.zeros((4*B,T), jnp.int32)
mask = jnp.ones((4*B,T), bool)
s = DeviceSample(imgs, sizes, boxes, labels, mask)
key = jax.random.PRNGKey(0)
out, ovf = fn(s, key)
np.asarray(out.images[0,0,0])  # force
def run(n):
    t0=time.perf_counter()
    o=None
    for i in range(n):
        o,_ = fn(s, jax.random.fold_in(key,i))
    np.asarray(o.images[0,0,0])
    return time.perf_counter()-t0
t1=run(10); t2=run(60)
dt=(t2-t1)/50
print(f"augment fn: {dt*1000:.1f} ms/batch of {B} -> {B/dt:.0f} img/s")
