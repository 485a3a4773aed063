"""Density + color field (Instant-NGP-style, hash-ensemble capable).

Reference: src/nersemble/nerfstudio/fields/nersemble_nerfacto_field.py:30-402.
- Base: hash-ensemble (time-blended) or single hash grid -> 64-wide bias-free
  MLP -> [density_logit, 15-dim geo feature]; density = trunc_exp (f32),
  zeroed outside the unit cube (strict selector).
- RGB head: [direction encoding (SH deg k or identity on shifted dirs),
  geo feature, optional per-image appearance embedding] -> 64-wide bias-free
  MLP x2 hidden -> sigmoid.

Functional pytree params; positions arrive in world space and are normalized
by the scene AABB here (matching SceneBox.get_normalized_positions).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nersemble_tpu.config import ModelConfig
from nersemble_tpu.ops.hash_encoding import (
    HashGridLevels,
    hash_encode,
    hash_encode_blended,
    init_hash_table,
    quad_from_cast,
)
from nersemble_tpu.ops.hash_ensemble import effective_blend_code
from nersemble_tpu.ops.fused_mlp import fused_mlp_apply
from nersemble_tpu.ops.mlp import apply_mlp, init_mlp
from nersemble_tpu.ops.sh import sh_encoding, shift_directions
from nersemble_tpu.ops.trunc_exp import trunc_exp


def build_levels(config: ModelConfig) -> HashGridLevels:
    if config.use_hash_ensemble:
        hc = config.hash_ensemble.hash_encoding
        return HashGridLevels.create(hc.n_levels, hc.log2_hashmap_size,
                                     hc.base_resolution, hc.per_level_scale)
    # single grid: growth derived from base/max res like nerfstudio
    # (reference: nersemble_nerfacto_field.py:90-92)
    import numpy as np
    growth = float(np.exp((np.log(config.max_res) - np.log(config.base_resolution))
                          / (config.num_levels - 1)))
    return HashGridLevels.create(config.num_levels, config.log2_hashmap_size,
                                 config.base_resolution, growth)


def table_row_width(config: ModelConfig) -> Tuple[int, int]:
    """(row_width W, features_per_logical F_l) for the shared [E, W] table.

    All logical tables share indices (identical hash function; reference:
    hash_ensemble.py:41-52), so the whole ensemble lives in one array whose
    row packs every logical table's features: W = H * F_l (2 for the plain
    single-grid field). This makes the HBM gather ONE fat-row fetch per
    (sample, level, corner) — the dominant cost on TPU.
    """
    if not config.use_hash_ensemble:
        return 2, 2
    he = config.hash_ensemble
    f_l = he.hash_encoding.n_features_per_level
    return he.n_hash_encodings * f_l, f_l


def direction_encoding_dim(config: ModelConfig) -> int:
    return config.spherical_harmonics_degree ** 2 \
        if config.spherical_harmonics_degree > 0 else 3


def init_field(rng, config: ModelConfig, levels: HashGridLevels):
    table_rng, base_rng, head_rng, app_rng = jax.random.split(rng, 4)
    row_width, f_l = table_row_width(config)
    table = init_hash_table(table_rng, levels, row_width,
                            dtype=jnp.dtype(config.param_dtype))

    base_in_dim = levels.n_levels * f_l
    mlp_base = init_mlp(base_rng, base_in_dim, 1 + config.geo_feat_dim,
                        config.num_layers, config.hidden_dim, bias=False)

    head_in = direction_encoding_dim(config) + config.geo_feat_dim
    if config.use_appearance_embedding:
        head_in += config.appearance_embedding_dim
    mlp_head = init_mlp(head_rng, head_in, 3, config.num_layers_color,
                        config.hidden_dim_color, bias=False)

    params = {"table": table, "mlp_base": mlp_base, "mlp_head": mlp_head}
    if config.use_appearance_embedding:
        params["appearance_embedding"] = jax.random.normal(
            app_rng, (max(config.num_images, 1), config.appearance_embedding_dim)) * 0.1
    return params


def normalize_positions(positions, aabb_min, aabb_max):
    return (positions - aabb_min) / (aabb_max - aabb_min)


def prepare_field(field_params, config: ModelConfig, levels: HashGridLevels,
                  replicate_sharding=None):
    """Per-step table preparation, hoisted OUT of the sample-chunk loop.

    Builds the xz-quad gather operand [E, 4W] (see
    hash_encoding.build_quad_table) once per train/render step in the
    table compute dtype (bf16 by default — tcnn runs its hash grids in fp16,
    reference: environment.yml tiny-cuda-nn). Differentiable: gradients fold
    back onto the canonical [E, W] f32 table.

    ``replicate_sharding``: set by the trainer under the ZeRO-3 entry-sharded
    table layout (ParallelConfig.shard_table_params). The cast to bf16 runs
    on the [E/devices, W] shard, THEN the sharding constraint forces the
    all-gather on the bf16 array (half the bytes), and the quad rolls run
    replicated. Its transpose is the bf16 reduce-scatter of the folded table
    gradient onto the entry shard, where the fused Adam update runs.
    """
    prepared = dict(field_params)
    t_cast = field_params["table"].astype(jnp.dtype(config.table_dtype))
    if replicate_sharding is not None:
        t_cast = jax.lax.with_sharding_constraint(t_cast, replicate_sharding)
    prepared["table_quad"] = quad_from_cast(t_cast, levels)
    return prepared


def field_density(params, positions_world: jnp.ndarray,
                  time_codes: Optional[jnp.ndarray],
                  config: ModelConfig, levels: HashGridLevels,
                  aabb_min, aabb_max,
                  window_hash=None,
                  compute_dtype=jnp.bfloat16):
    """[N, 3] world positions -> (density [N] f32, geo features [N, G]).

    ``params`` must be the output of :func:`prepare_field` (holds the
    xz-quad gather operand ``table_quad``). Positions outside the (0,1)^3
    normalized cube are zeroed before encoding and their density is zeroed
    after activation (reference: nersemble_nerfacto_field.py:266-293).
    """
    norm = normalize_positions(positions_world, aabb_min, aabb_max)
    selector = jnp.all((norm > 0.0) & (norm < 1.0), axis=-1)
    norm = norm * selector[..., None]

    smoothstep = (config.use_hash_ensemble
                  and config.hash_ensemble.hash_encoding.interpolation == "Smoothstep")
    _, f_l = table_row_width(config)
    if config.use_hash_ensemble:
        he = config.hash_ensemble
        code = effective_blend_code(
            time_codes, window_hash, he.n_hash_encodings,
            he.disable_initial_hash_ensemble, he.use_soft_transition)
        base_in = hash_encode_blended(params["table_quad"], norm, code, levels,
                                      features_per_logical=f_l,
                                      smoothstep=smoothstep)
    else:
        base_in = hash_encode(params["table_quad"], norm, levels,
                              smoothstep=smoothstep)

    if config.use_fused_mlp:
        h = fused_mlp_apply(params["mlp_base"], base_in,
                            compute_dtype=compute_dtype)
    else:
        h = apply_mlp(params["mlp_base"], base_in, compute_dtype=compute_dtype)
    density = trunc_exp(h[..., 0]) * selector
    geo = h[..., 1:]
    return density, geo


def field_rgb(params, directions: jnp.ndarray, geo: jnp.ndarray,
              config: ModelConfig,
              camera_indices: Optional[jnp.ndarray] = None,
              train: bool = True,
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, 3] unit view directions + [N, G] geo features -> [N, 3] rgb."""
    if config.spherical_harmonics_degree > 0:
        d_enc = sh_encoding(directions, config.spherical_harmonics_degree)
    else:
        # tcnn Identity on shifted directions
        # (reference: nersemble_nerfacto_field.py:107-112 with
        # shift_directions_for_tcnn at :313)
        d_enc = shift_directions(directions)

    inputs = [d_enc, geo]
    if config.use_appearance_embedding:
        emb = params["appearance_embedding"]
        if train and camera_indices is not None:
            app = emb[camera_indices]
        else:
            # eval uses zeros (reference: nersemble_nerfacto_field.py:334-337)
            app = jnp.zeros(directions.shape[:-1] + (emb.shape[-1],), emb.dtype)
        inputs.append(app)

    h = jnp.concatenate([i.astype(jnp.float32) for i in inputs], axis=-1)
    if config.use_fused_mlp:
        return fused_mlp_apply(params["mlp_head"], h, out_activation="sigmoid",
                               compute_dtype=compute_dtype)
    return apply_mlp(params["mlp_head"], h, out_activation=jax.nn.sigmoid,
                     compute_dtype=compute_dtype)
