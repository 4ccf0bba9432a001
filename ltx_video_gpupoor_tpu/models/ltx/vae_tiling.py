"""Tiled VAE encode/decode with overlap blending.

Parity target: ``AutoencoderKLWrapper`` tiling at
``/root/reference/ltx_video/models/autoencoders/vae.py`` — temporal
z-tiling with 0.25 overlap blending (``encode`` ``:265-310``, ``decode``
``:357-413``), spatial h/w tiling with v/h blends (``_hw_tiled_encode``
``:156-191``, ``_hw_tiled_decode`` ``:223-263``), VRAM-class tile table
(``get_VAE_tile_size`` ``:92-115``) — and the Wan spatial tiling
(``/root/reference/wan/modules/vae.py:611-706``).

On TPU the tile loops run host-side (one jitted encode/decode per tile
shape — tiles share shapes so compilation is reused); blending is
vectorized instead of the reference's per-row python loops. HBM usually
fits untiled decodes — tiling is the option for very large frames, exactly
as SURVEY §7 prescribes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import vae as ltx_vae

# Per-tile calls MUST be jitted: an eager decode dispatches hundreds of
# ops one-by-one (catastrophic through a remote-device relay). cfg is a
# frozen dataclass -> hashable static arg; params stay an argument so
# weights are not baked into the executable as constants.
_tile_decode = jax.jit(ltx_vae.decode, static_argnums=(1,))
_tile_encode = jax.jit(ltx_vae.encode, static_argnums=(1,))


def _spatial_tile_sizes(extent: int, tile: int, overlap_factor: float):
    overlap = int(tile * (1 - overlap_factor))
    return sorted({min(tile, extent - i) for i in range(0, extent, overlap)})


def _warm_concurrently(call, shapes, dtype=jnp.float32):
    """Trigger the XLA compile of every distinct tile shape from a thread
    pool: each compile is independent and takes ~a minute through the
    remote-relay compiler, so the tile loop's cold start is bounded by
    the slowest shape instead of the sum. No-op under tracing (the
    whole-tiled-call jit compiles one fused program instead)."""
    shapes = list(shapes)
    if len(shapes) <= 1:
        return
    import concurrent.futures as cf

    def one(shape):
        call(jnp.zeros(shape, dtype)).block_until_ready()

    with cf.ThreadPoolExecutor(max_workers=min(8, len(shapes))) as ex:
        list(ex.map(one, shapes))


def get_vae_tile_size(
    vae_config: int = 0,
    device_mem_mb: float = 16 * 1024,
    mixed_precision: bool = False,
) -> tuple[int, int]:
    """(z_tile latent frames, hw_tile pixels); 0 = no hw tiling
    (``vae.py:92-115``)."""
    z_tile = 4
    if vae_config == 0:
        if mixed_precision:
            device_mem_mb = device_mem_mb / 1.5
        if device_mem_mb >= 24000:
            vae_config = 1
        elif device_mem_mb >= 8000:
            vae_config = 2
        else:
            vae_config = 3
    hw_tile = {1: 0, 2: 512, 3: 256}[vae_config]
    return z_tile, hw_tile


def _ramp(extent: int, dtype) -> jax.Array:
    return (jnp.arange(extent, dtype=jnp.float32) / extent).astype(dtype)


def blend(a: jax.Array, b: jax.Array, extent: int, axis: int) -> jax.Array:
    """Linear crossfade: b's leading `extent` slices along `axis` blended
    with a's trailing `extent` slices (``vae.py:194-221``)."""
    extent = min(a.shape[axis], b.shape[axis], extent)
    if extent <= 0:
        return b
    w = _ramp(extent, b.dtype)
    shape = [1] * b.ndim
    shape[axis] = extent
    w = w.reshape(shape)
    a_tail = jax.lax.slice_in_dim(a, a.shape[axis] - extent, a.shape[axis],
                                  axis=axis)
    b_head = jax.lax.slice_in_dim(b, 0, extent, axis=axis)
    blended = a_tail * (1 - w) + b_head * w
    b_rest = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
    return jnp.concatenate([blended, b_rest], axis=axis)


def tiled_spatial(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    tile_in: int,
    tile_out: int,
    overlap_factor: float = 0.25,
    h_axis: int = 2,
    w_axis: int = 3,
) -> jax.Array:
    """Generic overlapping-tile spatial map (layout [B, F, H, W, C]).

    ``tile_in``: tile size in input pixels; ``tile_out``: corresponding
    output size; blending follows the reference's scheme."""
    overlap_in = int(tile_in * (1 - overlap_factor))
    blend_extent = int(tile_out * overlap_factor)
    limit = tile_out - blend_extent

    rows = []
    prev = None
    for i in range(0, x.shape[h_axis], overlap_in):
        row = []
        for j in range(0, x.shape[w_axis], overlap_in):
            tile = jax.lax.slice_in_dim(
                x, i, min(i + tile_in, x.shape[h_axis]), axis=h_axis
            )
            tile = jax.lax.slice_in_dim(
                tile, j, min(j + tile_in, x.shape[w_axis]), axis=w_axis
            )
            if prev is not None:
                # zero-valued data dependency on the previous tile's
                # output: under the fused whole-call jit this forces XLA
                # to SEQUENCE the tile evaluations so peak memory stays
                # at one tile's intermediates (an unordered fused tile
                # graph OOMed 16 GiB on the Wan path — wan/vae.py)
                tok = (jnp.nan_to_num(prev[(0,) * prev.ndim]) * 0).astype(tile.dtype)
                tile = tile + tok
            prev = fn(tile)
            row.append(prev)
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            # the reference blends tiles in place, so each neighbor is the
            # already-blended tile — mirror by writing back into the grid
            if i > 0:
                tile = blend(rows[i - 1][j], tile, blend_extent, h_axis)
            if j > 0:
                tile = blend(row[j - 1], tile, blend_extent, w_axis)
            row[j] = tile
            result_row.append(
                jax.lax.slice_in_dim(
                    jax.lax.slice_in_dim(
                        tile, 0, min(limit, tile.shape[h_axis]), axis=h_axis
                    ),
                    0, min(limit, tile.shape[w_axis]), axis=w_axis,
                )
            )
        result_rows.append(jnp.concatenate(result_row, axis=w_axis))
    return jnp.concatenate(result_rows, axis=h_axis)


def tiled_encode(
    params: dict,
    cfg: ltx_vae.VAEConfig,
    media: jax.Array,            # [B, F, H, W, 3]
    z_tile: int = 4,             # latent frames per temporal tile
    hw_tile: int = 0,            # pixel tile size; 0 = no spatial tiling
    overlap_factor: float = 0.25,
) -> jax.Array:
    """Tiled causal encode mirroring ``vae.py:265-310``."""
    sf = cfg.spatial_downscale_factor

    def encode_fn(x):
        return _tile_encode(params, cfg, x)

    def encode_maybe_hw(x):
        # either dimension over the tile engages tiling (a wide frame
        # must tile even when short)
        if hw_tile and (x.shape[2] > hw_tile or x.shape[3] > hw_tile):
            return tiled_spatial(
                encode_fn, x, hw_tile, hw_tile // sf, overlap_factor
            )
        return encode_fn(x)

    t = media.shape[1]
    tile_latent_t = z_tile
    tile_sample_t = tile_latent_t * cfg.temporal_downscale_factor
    use_z = z_tile > 1 and t > tile_sample_t + 1
    if not use_z:
        return encode_maybe_hw(media)

    overlap = int(tile_sample_t * (1 - overlap_factor))
    blend_extent = int(tile_latent_t * overlap_factor)
    t_limit = tile_latent_t - blend_extent

    row = []
    prev = None
    for i in range(0, t, overlap):
        tile = media[:, i: i + tile_sample_t + 1]
        if prev is not None:
            # sequence temporal tiles under the fused jit (see
            # tiled_spatial) so peak memory stays one-tile-scale
            tile = tile + (jnp.nan_to_num(prev[(0,) * prev.ndim]) * 0).astype(tile.dtype)
        prev = encode_maybe_hw(tile)
        enc = prev
        if i > 0:
            enc = enc[:, 1:]
        row.append(enc)
    result = []
    for i, tile in enumerate(row):
        if i > 0:
            tile = blend(row[i - 1], tile, blend_extent, 1)
            result.append(tile[:, :t_limit])
        else:
            result.append(tile[:, : t_limit + 1])
    return jnp.concatenate(result, axis=1)


def tiled_decode(
    params: dict,
    cfg: ltx_vae.VAEConfig,
    latents: jax.Array,          # [B, F', H', W', z]
    z_tile: int = 4,
    hw_tile: int = 0,
    overlap_factor: float = 0.25,
    timestep: Optional[jax.Array] = None,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Tiled decode mirroring ``vae.py:357-413``."""
    sf = cfg.spatial_downscale_factor
    hw_tile_latent = hw_tile // sf if hw_tile else 0

    def decode_fn(z):
        return _tile_decode(params, cfg, z, timestep, noise_key)

    def decode_maybe_hw(z):
        if hw_tile_latent and (
            z.shape[2] > hw_tile_latent or z.shape[3] > hw_tile_latent
        ):
            return tiled_spatial(
                decode_fn, z, hw_tile_latent, hw_tile, overlap_factor
            )
        return decode_fn(z)

    t = latents.shape[1]
    tf = cfg.temporal_downscale_factor
    use_z = z_tile > 1 and t > z_tile + 1
    if not use_z:
        # spatially-tiled-but-temporally-short decodes still benefit from
        # the concurrent compile warmup below
        if not isinstance(latents, jax.core.Tracer) and hw_tile_latent and (
            latents.shape[2] > hw_tile_latent
            or latents.shape[3] > hw_tile_latent
        ):
            b, _, h_lat, w_lat, c = latents.shape
            hw_pairs = [
                (th, tw)
                for th in _spatial_tile_sizes(h_lat, hw_tile_latent,
                                              overlap_factor)
                for tw in _spatial_tile_sizes(w_lat, hw_tile_latent,
                                              overlap_factor)
            ]
            _warm_concurrently(
                decode_fn,
                [(b, t, th, tw, c) for th, tw in hw_pairs],
                latents.dtype,
            )
        return decode_maybe_hw(latents)

    tile_sample_t = z_tile * tf
    overlap = int(z_tile * (1 - overlap_factor))
    blend_extent = int(tile_sample_t * overlap_factor)
    t_limit = tile_sample_t - blend_extent

    # compile the distinct leaf tile shapes concurrently up front
    # (skipped under an outer trace — the fused jit is one program)
    if not isinstance(latents, jax.core.Tracer):
        b, _, h_lat, w_lat, c = latents.shape
        t_sizes = {min(z_tile + 1, t - i) for i in range(0, t, overlap)}
        if hw_tile_latent and (
            h_lat > hw_tile_latent or w_lat > hw_tile_latent
        ):
            hw_pairs = [
                (th, tw)
                for th in _spatial_tile_sizes(h_lat, hw_tile_latent,
                                              overlap_factor)
                for tw in _spatial_tile_sizes(w_lat, hw_tile_latent,
                                              overlap_factor)
            ]
        else:
            hw_pairs = [(h_lat, w_lat)]
        _warm_concurrently(
            decode_fn,
            [(b, ft, th, tw, c) for ft in t_sizes for th, tw in hw_pairs],
            latents.dtype,
        )

    row = []
    prev = None
    for i in range(0, t, overlap):
        tile = latents[:, i: i + z_tile + 1]
        if prev is not None:
            # sequence temporal tiles under the fused jit (see
            # tiled_spatial) so peak memory stays one-tile-scale
            tile = tile + (jnp.nan_to_num(prev[(0,) * prev.ndim]) * 0).astype(tile.dtype)
        prev = decode_maybe_hw(tile)
        dec = prev
        if i > 0:
            dec = dec[:, 1:]
        row.append(dec)
    result = []
    for i, tile in enumerate(row):
        if i > 0:
            tile = blend(row[i - 1], tile, blend_extent, 1)
            result.append(tile[:, :t_limit])
        else:
            result.append(tile[:, : t_limit + 1])
    return jnp.concatenate(result, axis=1)


def parallel_spatial_map(
    mesh, tile_fn, z, tile_in, tile_out, overlap_factor, extra_args=(),
):
    """Generic overlapping-tile spatial map with the tile grid decoded
    in PARALLEL over every device of ``mesh`` (flat shard_map over the
    stacked tile axis), then blended exactly like :func:`tiled_spatial`.
    Shared by both VAE families (LTX here, Wan in ``wan/vae.py``).

    ``tile_fn(tile, *extra_args)`` maps one ``[B, F, tile_in, tile_in,
    C]`` latent tile to its ``[B, F', tile_out', tile_out', C']`` pixels
    (``extra_args`` — params, decode timestep, … — are passed replicated;
    do NOT close over traced arrays). Tail tiles are made uniform by
    edge-replicate padding the latent (the sequential path's ragged
    tails see conv truncation instead; both are artificial context, and
    outputs agree with the untiled decode to the same seam tolerance).
    Each device runs its share of tiles sequentially (``lax.map``) so
    per-device peak memory stays at one tile's intermediates.

    Returns the blended output UNCROPPED along H/W (callers crop to
    ``h * sf`` / ``w * sf``)."""
    from jax.sharding import PartitionSpec as P

    overlap_in = int(tile_in * (1 - overlap_factor))
    blend_extent = int(tile_out * overlap_factor)
    limit = tile_out - blend_extent
    h, w = z.shape[2], z.shape[3]
    starts_h = list(range(0, h, overlap_in))
    starts_w = list(range(0, w, overlap_in))
    pad_h = max(0, starts_h[-1] + tile_in - h)
    pad_w = max(0, starts_w[-1] + tile_in - w)
    zp = jnp.pad(
        z, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
    )
    tiles = jnp.stack(
        [zp[:, :, i: i + tile_in, j: j + tile_in]
         for i in starts_h for j in starts_w]
    )  # [T, B, F, tile_in, tile_in, C]
    n_tiles = tiles.shape[0]
    pad_t = (-n_tiles) % mesh.devices.size
    if pad_t:
        tiles = jnp.concatenate([tiles] + [tiles[-1:]] * pad_t)

    def local(tiles, *extra):
        return jax.lax.map(lambda tl: tile_fn(tl, *extra), tiles)

    tile_spec = P(mesh.axis_names)  # flat: every mesh axis takes tiles
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tile_spec,) + (P(),) * len(extra_args),
        out_specs=tile_spec,
    )(tiles, *extra_args)[:n_tiles]

    nw = len(starts_w)
    grid = [[out[r * nw + cix] for cix in range(nw)]
            for r in range(len(starts_h))]
    result_rows = []
    for i, row in enumerate(grid):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend(grid[i - 1][j], tile, blend_extent, 2)
            if j > 0:
                tile = blend(row[j - 1], tile, blend_extent, 3)
            row[j] = tile
            result_row.append(tile[:, :, :limit, :limit])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


def _parallel_spatial_decode(
    mesh, params, cfg, z, tile_in, tile_out, overlap_factor,
    timestep, noise_key,
):
    """LTX wrapper over :func:`parallel_spatial_map`."""
    has_t = timestep is not None
    has_k = noise_key is not None
    t_arg = timestep if has_t else jnp.zeros((), jnp.float32)
    k_arg = noise_key if has_k else jax.random.key(0)

    def tile_fn(tile, params, t_arg, k_arg):
        return ltx_vae.decode(
            params, cfg, tile,
            t_arg if has_t else None,
            k_arg if has_k else None,
        )

    full = parallel_spatial_map(
        mesh, tile_fn, z, tile_in, tile_out, overlap_factor,
        extra_args=(params, t_arg, k_arg),
    )
    sf = cfg.spatial_downscale_factor
    return full[:, :, : z.shape[2] * sf, : z.shape[3] * sf]


def parallel_tiled_decode(
    mesh,
    params: dict,
    cfg: ltx_vae.VAEConfig,
    latents: jax.Array,          # [B, F', H', W', z]
    z_tile: int = 4,
    hw_tile: int = 0,
    overlap_factor: float = 0.25,
    timestep: Optional[jax.Array] = None,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Tiled decode with the spatial tile grid fanned out over every
    device of the serving mesh — the multi-chip counterpart of
    :func:`tiled_decode` (which the reference runs on one GPU,
    ``vae.py:357-413``). Temporal tiles stay sequential (one-frame
    causal overlap + memory bound); each one's spatial grid is decoded
    by all devices at once. Falls back to the sequential path when no
    mesh / one device / spatial tiling not engaged."""
    sf = cfg.spatial_downscale_factor
    tile_lat = hw_tile // sf if hw_tile else 0
    b, t, h, w, c = latents.shape
    spatial = bool(tile_lat) and (h > tile_lat or w > tile_lat)
    if mesh is None or mesh.devices.size == 1 or not spatial:
        return tiled_decode(params, cfg, latents, z_tile, hw_tile,
                            overlap_factor, timestep, noise_key)

    def decode_hw(zz):
        return _parallel_spatial_decode(
            mesh, params, cfg, zz, tile_lat, hw_tile, overlap_factor,
            timestep, noise_key,
        )

    use_z = z_tile > 1 and t > z_tile + 1
    if not use_z:
        return decode_hw(latents)

    tf = cfg.temporal_downscale_factor
    tile_sample_t = z_tile * tf
    overlap = int(z_tile * (1 - overlap_factor))
    blend_extent = int(tile_sample_t * overlap_factor)
    t_limit = tile_sample_t - blend_extent

    row = []
    prev = None
    for i in range(0, t, overlap):
        tile = latents[:, i: i + z_tile + 1]
        if prev is not None:
            # sequence temporal slabs (see tiled_spatial) so peak memory
            # stays at one slab's grid
            tile = tile + (jnp.nan_to_num(prev[(0,) * prev.ndim]) * 0).astype(tile.dtype)
        prev = decode_hw(tile)
        dec = prev
        if i > 0:
            dec = dec[:, 1:]
        row.append(dec)
    result = []
    for i, tile in enumerate(row):
        if i > 0:
            tile = blend(row[i - 1], tile, blend_extent, 1)
            result.append(tile[:, :t_limit])
        else:
            result.append(tile[:, : t_limit + 1])
    return jnp.concatenate(result, axis=1)


# Fused whole-call jits: the host tile loops unroll at TRACE time, so the
# entire tiled encode/decode — every per-tile model call, slice, and
# blend — compiles into ONE XLA program. Through a remote-device relay
# this matters enormously: the eager tile loop dispatches hundreds of
# small host->device calls (measured ~90 s for a 36-tile decode that is
# ~2 s of compute), while the fused program is a single dispatch and lets
# XLA sequence tile buffers so peak memory stays at one-tile scale.
tiled_encode_fused = jax.jit(
    tiled_encode,
    static_argnames=("cfg", "z_tile", "hw_tile", "overlap_factor"),
)
tiled_decode_fused = jax.jit(
    tiled_decode,
    static_argnames=("cfg", "z_tile", "hw_tile", "overlap_factor"),
)
