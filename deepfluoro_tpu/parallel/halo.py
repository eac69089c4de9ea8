"""Explicit spatial sharding with halo exchange.

For 2x / full-resolution frames (1436^2 after the 50px crop,
hdf5_layouts/Readme.md:42-45 + README.md:84) a single chip's HBM and the
per-chip FLOP budget favor sharding the image H axis across the mesh. XLA's
GSPMD partitioner emits conv halo exchanges automatically when inputs carry a
spatial sharding (parallel/sharding.py); this module provides the *manual*
shard_map + ppermute construction for when explicit control over the
communication schedule wins (e.g. fusing the exchange with Pallas kernels).

``halo_exchange`` trades ``halo`` rows with mesh neighbors over ICI
(jax.lax.ppermute); boundary shards reflect-pad instead, matching the
framework's reflect-padded convolution semantics at image borders.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _halo_exchange_local(x, halo: int, axis_name: str):
    """Inside shard_map: x is the local (B, H_loc, W, C) shard. Returns
    (B, H_loc + 2*halo, W, C) with neighbor rows (or edge reflection at the
    global boundary)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x[:, :halo]          # rows this shard sends upward
    bot_rows = x[:, -halo:]         # rows this shard sends downward

    # receive the bottom rows of the shard above us (shift down: i -> i+1)
    from_above = jax.lax.ppermute(
        bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # receive the top rows of the shard below us (shift up: i -> i-1)
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [(i + 1, i) for i in range(n - 1)]
    )

    # global boundary shards get reflection of their own edge instead
    reflect_top = x[:, 1 : halo + 1][:, ::-1]
    reflect_bot = x[:, -halo - 1 : -1][:, ::-1]
    top = jnp.where(idx == 0, reflect_top, from_above)
    bot = jnp.where(idx == n - 1, reflect_bot, from_below)

    return jnp.concatenate([top, x, bot], axis=1)


def halo_exchange(mesh: Mesh, x, halo: int, axis: str = "spatial"):
    """Exchange ``halo`` rows between H-axis shards of a (B, H, W, C) array
    sharded P(None, axis). Returns the per-shard haloed array stacked back as
    a global (B, H + 2*halo*n_shards, W, C)? No — this is a shard_map-level
    primitive; see ``sharded_conv2d`` for end-to-end use."""
    fn = jax.shard_map(
        partial(_halo_exchange_local, halo=halo, axis_name=axis),
        mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=P(None, axis, None, None),
    )
    return fn(x)


def sharded_conv2d(mesh: Mesh, x, kernel, axis: str = "spatial"):
    """Reflect-padded SAME 2D convolution with the H axis sharded over
    ``axis`` and explicit halo exchange — numerically identical to the
    unsharded reflect-pad conv. kernel: (kh, kw, cin, cout), odd kh/kw.

    Demonstrates (and tests) the manual communication path; production
    convs go through the GSPMD-partitioned jit programs instead.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    assert kh % 2 == 1 and kw % 2 == 1
    halo = kh // 2

    def local(x_loc, kernel):
        x_h = _halo_exchange_local(x_loc, halo, axis)
        x_h = jnp.pad(x_h, ((0, 0), (0, 0), (kw // 2, kw // 2), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            x_h,
            kernel,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, None, None, None)),
        out_specs=P(None, axis, None, None),
    )
    return fn(x, kernel)
