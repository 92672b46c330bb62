"""Sharded rendering: pixels split across the device mesh, scene replicated.

Strategy (SURVEY.md section 2.3 / 7): data parallelism over pixels is the
reference's only axis (row blocks over 8 pthreads, main.cpp:38-39); here the
flattened pixel batch is sharded on the ``tiles`` mesh axis with
``jax.sharding`` annotations and jit — XLA partitions the whole integrator
SPMD and inserts any needed collectives (psum for scalar reductions and for
parameter gradients in the differentiable path) over ICI.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from advanced_cpu_raytracing_tpu.parallel.mesh import (
    make_device_mesh,
    replicated,
    tile_sharding,
)
from advanced_cpu_raytracing_tpu.render.integrator import (
    RenderOptions,
    trace_radiance,
)


@partial(jax.jit, static_argnames=("opts",))
def _traced(pack, cam, px, py, key, opts):
    return trace_radiance(pack, cam, px, py, key, opts)


def render_sharded(pack, cam, px, py, key, opts: RenderOptions, mesh=None):
    """Render a flat pixel batch sharded across devices.

    ``px``/``py`` length must divide by the mesh size (pad upstream).
    Returns the gathered (R,3) radiance.
    """
    if mesh is None:
        mesh = make_device_mesh()
    shard = tile_sharding(mesh)
    repl = replicated(mesh)
    px = jax.device_put(jnp.asarray(px), shard)
    py = jax.device_put(jnp.asarray(py), shard)
    pack = jax.device_put(pack, repl)
    cam = jax.device_put(cam, repl)
    key = jax.device_put(key, repl)
    out = _traced(pack, cam, px, py, key, opts)
    return np.asarray(out)


def loss_and_grads(pack, cam, px, py, key, opts: RenderOptions, target,
                   param_extract, param_inject, mesh=None):
    """Sharded differentiable render step: pixel-MSE loss against ``target``
    and gradients w.r.t. the extracted parameter pytree.

    Parameters are replicated, pixels sharded; XLA all-reduces the parameter
    gradients over ICI automatically (the gradient of a replicated array fed
    by sharded compute is a psum).
    """
    if mesh is None:
        mesh = make_device_mesh()
    shard = tile_sharding(mesh)
    repl = replicated(mesh)

    params = param_extract(pack)

    def loss_fn(params, pack, cam, px, py, key, target):
        pack = param_inject(pack, params)
        img = trace_radiance(pack, cam, px, py, key, opts)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn), static_argnames=())
    px = jax.device_put(jnp.asarray(px), shard)
    py = jax.device_put(jnp.asarray(py), shard)
    target = jax.device_put(jnp.asarray(target), shard)
    pack = jax.device_put(pack, repl)
    cam = jax.device_put(cam, repl)
    params = jax.device_put(params, repl)
    return grad_fn(params, pack, cam, px, py, key, target)
