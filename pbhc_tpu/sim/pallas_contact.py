"""Pallas TPU kernel: batched APGD contact solve, env-in-lanes.

The XLA contact solve iterates 32 batched [3K,3K] matvecs whose tiny minor
dims pad badly on TPU tiles. This kernel keeps a 128-env tile resident in
VMEM with the ENV axis in the lanes ([3K, 3K, 128] Delassus tile), so every
APGD iteration is one fused multiply+reduce over full lanes — zero padding
waste, no HBM traffic inside the loop.

Interpret mode makes the kernel testable on CPU; `solve_contacts_pallas` is a
drop-in for the XLA path behind EngineOptions(solver="pallas").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _beta_schedule(iters):
    """APGD momentum coefficients. The theta recurrence is data-independent,
    so it is evaluated in python: keeping a 0-d theta in the device loop carry
    produced a (1,128)->(8,128) replicated-relayout Mosaic error."""
    betas = []
    theta = 1.0
    for _ in range(iters):
        theta_new = 0.5 * ((theta**4 + 4 * theta**2) ** 0.5 - theta**2)
        betas.append(theta * (1.0 - theta) / (theta**2 + theta_new))
        theta = theta_new
    return betas


def _apgd_kernel(A_ref, b_ref, mu_ref, active_ref, lam_ref, *, iters, K):
    """One program solves LANES envs.

    A [3K,3K,L], b [3K,L], mu [1,L], active [K,L] -> lam [3K,L].
    """
    A = A_ref[0]                                                     # [3K,3K,L]
    b = b_ref[0]                                                     # [3K,L]
    mu = mu_ref[0, 0]                                                # [L]
    active = active_ref[0]                                           # [K,L]
    n = 3 * K

    # Lipschitz bound over ACTIVE rows only (see engine._solve_contacts)
    act3 = jnp.broadcast_to(active[:, None, :], (K, 3, active.shape[-1])).reshape(n, -1)
    L_const = jnp.max(act3 * jnp.sum(jnp.abs(A) * act3[None], axis=1), axis=0)
    inv_L = 1.0 / jnp.maximum(L_const, 1e-6)

    def project(lam):                                                # [3K,L]
        lam3 = lam.reshape(K, 3, -1)
        ln = jnp.maximum(lam3[:, 2], 0.0)                            # [K,L]
        lt = lam3[:, :2]
        tn = jnp.sqrt(lt[:, 0] ** 2 + lt[:, 1] ** 2)
        scale = jnp.minimum(1.0, mu[None] * ln / jnp.maximum(tn, 1e-9))
        out = jnp.concatenate([(lt * scale[:, None]), ln[:, None]], axis=1)
        return (out * active[:, None]).reshape(n, -1)

    # statically unrolled with python-float momentum coefficients: both a scan
    # and a fori_loop here fail to lower in Mosaic (0-d momentum carry ->
    # (1,128)->(8,128) replicated-relayout error; SMEM-indexed beta table ->
    # remote-compile failure). The unroll compiles slowly once and is cached.
    x = jnp.zeros_like(b)
    x_prev = x
    for beta in _beta_schedule(iters):
        y = x + beta * (x - x_prev)
        # g = A y + b: multiply+reduce, fully lane-parallel
        g = jnp.sum(A * y[None, :, :], axis=1) + b                   # [3K,L]
        x_prev = x
        x = project(y - inv_L[None] * g)
    lam_ref[0] = x


@partial(jax.jit, static_argnames=("iters", "interpret"))
def solve_contacts_pallas_lanes(A, b, mu, active, iters=32, interpret=False,
                                x0=None):
    """Lanes-native batched APGD: inputs already env-last, ZERO transposes.

    A [3K,3K,N], b [3K,N], mu [N], active [K,N] -> lam [3K,N].
    `x0` [3K,N] (optional) warm-starts the iteration.
    N must be a multiple of 128. The grid tiles the env (lane) axis; each
    program keeps its [3K,3K,128] Delassus tile resident in VMEM for all
    iterations — the XLA scan re-reads A from HBM every iteration instead
    (~32x sizeof(A) of traffic).
    """
    n, _, N = A.shape
    K = n // 3
    assert N % LANES == 0, f"N={N} must be a multiple of {LANES}"
    G = N // LANES
    if x0 is None:
        x0 = jnp.zeros_like(b)

    return pl.pallas_call(
        partial(_apgd_kernel_lanes, iters=iters, K=K),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda g: (0, 0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANES), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, N), A.dtype),
        interpret=interpret,
    )(A, b, mu[None], active, x0)


def _apgd_kernel_lanes(A_ref, b_ref, mu_ref, active_ref, x0_ref, lam_ref, *, iters, K):
    """Grid-blocked twin of _apgd_kernel (blocks carry no leading grid dim)."""
    A = A_ref[:]                                                     # [3K,3K,L]
    b = b_ref[:]                                                     # [3K,L]
    mu = mu_ref[0]                                                   # [L]
    active = active_ref[:]                                           # [K,L]
    n = 3 * K

    # Lipschitz bound over ACTIVE rows only (see engine._solve_contacts)
    act3 = jnp.broadcast_to(active[:, None, :], (K, 3, active.shape[-1])).reshape(n, -1)
    L_const = jnp.max(act3 * jnp.sum(jnp.abs(A) * act3[None], axis=1), axis=0)
    inv_L = 1.0 / jnp.maximum(L_const, 1e-6)

    def project(lam):                                                # [3K,L]
        lam3 = lam.reshape(K, 3, -1)
        ln = jnp.maximum(lam3[:, 2], 0.0)
        tn = jnp.sqrt(lam3[:, 0] ** 2 + lam3[:, 1] ** 2)
        scale = jnp.minimum(1.0, mu[None] * ln / jnp.maximum(tn, 1e-9))
        out = jnp.stack([lam3[:, 0] * scale, lam3[:, 1] * scale, ln], axis=1)
        return (out * active[:, None]).reshape(n, -1)

    x = project(x0_ref[:])
    x_prev = x
    for beta in _beta_schedule(iters):                               # static unroll
        y = x + beta * (x - x_prev)
        g = jnp.sum(A * y[None, :, :], axis=1) + b
        x_prev = x
        x = project(y - inv_L[None] * g)
    lam_ref[:] = x


@partial(jax.jit, static_argnames=("iters", "interpret"))
def solve_contacts_pallas(A, b, mu, active, iters=32, interpret=False):
    """Batched friction-cone APGD.

    A [N,3K,3K], b [N,3K], mu [N], active [N,K] -> impulses [N,K,3].
    N must be a multiple of 128 (pad outside if needed).
    """
    N, n, _ = A.shape
    K = n // 3
    assert N % LANES == 0, f"N={N} must be a multiple of {LANES}"
    G = N // LANES

    # env-in-lanes layout, grid-major leading axis
    A_t = jnp.moveaxis(A.reshape(G, LANES, n, n), 1, -1)             # [G,n,n,L]
    b_t = jnp.moveaxis(b.reshape(G, LANES, n), 1, -1)                # [G,n,L]
    mu_t = mu.reshape(G, 1, LANES)                                   # [G,1,L]
    act_t = jnp.moveaxis(active.reshape(G, LANES, K), 1, -1)         # [G,K,L]

    lam = pl.pallas_call(
        partial(_apgd_kernel, iters=iters, K=K),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, n, n, LANES), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, n, LANES), A.dtype),
        interpret=interpret,
    )(A_t, b_t, mu_t, act_t)

    lam = jnp.moveaxis(lam, -1, 1).reshape(N, n)                     # [N,3K]
    return lam.reshape(N, K, 3)
