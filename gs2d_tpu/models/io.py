"""Model checkpoint IO.

Two formats, mirroring the reference's dual scheme (SURVEY.md §5.4):
(a) PLY snapshots with the exact 3DGS attribute schema
    (scene/gaussian_model.py:176-255) — ecosystem-compatible, stores only
    ACTIVE Gaussians;
(b) full training state (params + Adam moments + densify stats + step) as
    a compressed npz — the analog of torch.save((capture(), iter)).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.ply import read_ply, write_ply
from ..train.optim import AdamState
from .gaussians import GaussianParams, GaussianState


def save_ply(state: GaussianState, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    act = np.asarray(state.active)
    p = jax.tree_util.tree_map(lambda x: np.asarray(x)[act], state.params)
    n = p.xyz.shape[0]
    cols = {"x": p.xyz[:, 0], "y": p.xyz[:, 1], "z": p.xyz[:, 2],
            "nx": np.zeros(n), "ny": np.zeros(n), "nz": np.zeros(n)}
    # features: stored channel-major flattened like the reference
    # (transpose(1,2).flatten → channel varies slower than coeff)
    fdc = p.features_dc.transpose(0, 2, 1).reshape(n, -1)
    for i in range(fdc.shape[1]):
        cols[f"f_dc_{i}"] = fdc[:, i]
    frest = p.features_rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(frest.shape[1]):
        cols[f"f_rest_{i}"] = frest[:, i]
    cols["opacity"] = p.opacity[:, 0]
    for i in range(p.scaling.shape[1]):
        cols[f"scale_{i}"] = p.scaling[:, i]
    for i in range(p.rotation.shape[1]):
        cols[f"rot_{i}"] = p.rotation[:, i]
    write_ply(path, cols)


def load_ply(path: str, capacity: int | None = None,
             max_sh_degree: int = 3) -> GaussianState:
    cols = read_ply(path)
    n = len(cols["x"])
    cap = capacity or n
    if cap < n:
        # a densified model routinely exceeds the caller's default
        # capacity bucket — grow to the next power-of-two bucket that
        # fits (the reference's load_ply has no capacity notion at all;
        # crashing the render/eval of a trained model is never right)
        cap = 1
        while cap < n:
            cap <<= 1
    K = (max_sh_degree + 1) ** 2

    def grab(prefix, count):
        names = sorted((k for k in cols if k.startswith(prefix)),
                       key=lambda s: int(s.rsplit("_", 1)[1]))
        assert len(names) == count, (prefix, len(names), count)
        return np.stack([cols[k] for k in names], -1)

    fdc = grab("f_dc_", 3).reshape(n, 3, 1).transpose(0, 2, 1)
    frest = grab("f_rest_", 3 * (K - 1)).reshape(n, 3, K - 1) \
        .transpose(0, 2, 1)
    scaling = grab("scale_", 2)
    rotation = grab("rot_", 4)

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = GaussianParams(
        xyz=pad(np.stack([cols["x"], cols["y"], cols["z"]], -1)),
        features_dc=pad(fdc), features_rest=pad(frest),
        scaling=pad(scaling), rotation=pad(rotation),
        opacity=pad(cols["opacity"][:, None]),
    )
    zeros = jnp.zeros((cap,), jnp.float32)
    return GaussianState(
        params=params, active=jnp.asarray(np.arange(cap) < n),
        active_sh_degree=jnp.int32(max_sh_degree),   # load_ply:255 contract
        max_radii2d=zeros, grad_accum=zeros, denom=zeros)


def save_checkpoint(path: str, state: GaussianState, opt: AdamState,
                    iteration: int, spatial_lr_scale: float = 1.0) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    for name, tree in (("p", state.params), ("mu", opt.mu), ("nu", opt.nu)):
        for f in dataclasses.fields(GaussianParams):
            flat[f"{name}.{f.name}"] = np.asarray(getattr(tree, f.name))
    np.savez_compressed(
        path, **flat,
        active=np.asarray(state.active),
        active_sh_degree=np.asarray(state.active_sh_degree),
        max_radii2d=np.asarray(state.max_radii2d),
        grad_accum=np.asarray(state.grad_accum),
        denom=np.asarray(state.denom),
        opt_step=np.asarray(opt.step),
        iteration=np.int64(iteration),
        spatial_lr_scale=np.float64(spatial_lr_scale))


def save_checkpoint_orbax(path: str, state: GaussianState, opt: AdamState,
                          iteration: int,
                          spatial_lr_scale: float = 1.0) -> None:
    """Orbax pytree checkpoint (SURVEY.md §5.4 TPU equivalent).

    Unlike the npz format, sharded arrays (phase-B ``gauss``-axis
    parameter sharding, multi-host pods) are written per-shard in
    parallel without gathering to one host — use this on pods; npz stays
    the dependency-light single-host default."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        # force=True: re-hitting a checkpoint iteration (resume crossing
        # its own save point) must overwrite like the npz path does
        # shallow field dicts: dataclasses.asdict DEEPCOPIES every
        # jax.Array, transiently doubling params+moments on device —
        # on the HBM-constrained pod path this function exists for
        def shallow(obj):
            if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
                return {f.name: shallow(getattr(obj, f.name))
                        for f in dataclasses.fields(obj)}
            return obj

        ckptr.save(os.path.abspath(path), {
            "state": shallow(state),
            "opt": shallow(opt),
            "iteration": iteration,
            "spatial_lr_scale": spatial_lr_scale,
        }, force=True)


def load_checkpoint_orbax(path: str, capacity_sharding=None
                          ) -> Tuple[GaussianState, AdamState, int, float]:
    """Restore an Orbax checkpoint.

    ``capacity_sharding``: optional ``jax.sharding.Sharding`` applied to
    every capacity-sized array (params, moments, masks, stats) so a pod
    restore lands on its device shards. The restore itself is host-local
    first (each process transiently holds a full host copy before the
    device_put shards it) — host RAM, not HBM, bounds the transient.
    None keeps everything host-local.
    """
    import jax
    import orbax.checkpoint as ocp

    apath = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(apath)
    if capacity_sharding is not None:
        raw = jax.tree.map(
            lambda x: jax.device_put(x, capacity_sharding)
            if getattr(x, "ndim", 0) >= 1 else x, raw)
    state = GaussianState(
        params=GaussianParams(**raw["state"]["params"]),
        active=raw["state"]["active"],
        active_sh_degree=raw["state"]["active_sh_degree"],
        max_radii2d=raw["state"]["max_radii2d"],
        grad_accum=raw["state"]["grad_accum"],
        denom=raw["state"]["denom"])
    opt = AdamState(mu=GaussianParams(**raw["opt"]["mu"]),
                    nu=GaussianParams(**raw["opt"]["nu"]),
                    step=raw["opt"]["step"])
    return state, opt, int(raw["iteration"]), float(raw["spatial_lr_scale"])


def load_checkpoint(path: str) -> Tuple[GaussianState, AdamState, int, float]:
    z = np.load(path)

    def tree(prefix):
        return GaussianParams(**{
            f.name: jnp.asarray(z[f"{prefix}.{f.name}"])
            for f in dataclasses.fields(GaussianParams)})

    state = GaussianState(
        params=tree("p"), active=jnp.asarray(z["active"]),
        active_sh_degree=jnp.asarray(z["active_sh_degree"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
        grad_accum=jnp.asarray(z["grad_accum"]),
        denom=jnp.asarray(z["denom"]))
    opt = AdamState(mu=tree("mu"), nu=tree("nu"),
                    step=jnp.asarray(z["opt_step"]))
    return state, opt, int(z["iteration"]), float(z["spatial_lr_scale"])
