"""Config system: nested dataclasses with YAML round-trip.

Plays the role of the reference's nerfstudio dataclass config tree + tyro CLI +
elias config serialization (reference: scripts/train/train_nersemble.py:146-260,
src/nersemble/model_manager/base.py:39-46). The full training config is saved to
``config.yml`` in the run folder and is the source of truth reloaded at
evaluation/render time (reference: src/nersemble/util/setup.py:39,74-88).
"""

from __future__ import annotations

import dataclasses
import typing
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import yaml


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return tp, False


def _encode(value):
    if dataclasses.is_dataclass(value):
        return {f.name: _encode(getattr(value, f.name)) for f in dataclasses.fields(value)}
    if isinstance(value, dict):
        return {k: _encode(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    if isinstance(value, Path):
        return str(value)
    return value


def _decode(tp, value):
    tp, _ = _unwrap_optional(tp)
    if value is None:
        return None
    if dataclasses.is_dataclass(tp):
        kwargs = {}
        hints = typing.get_type_hints(tp)
        for f in dataclasses.fields(tp):
            if f.name in value:
                kwargs[f.name] = _decode(hints[f.name], value[f.name])
        return tp(**kwargs)
    origin = typing.get_origin(tp)
    if origin in (list, List):
        (item_tp,) = typing.get_args(tp) or (typing.Any,)
        return [_decode(item_tp, v) for v in value]
    if origin in (tuple, Tuple):
        args = typing.get_args(tp)
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(_decode(args[0], v) for v in value)
        if args:
            return tuple(_decode(a, v) for a, v in zip(args, value))
        return tuple(value)
    if origin in (dict, Dict):
        args = typing.get_args(tp)
        val_tp = args[1] if len(args) == 2 else typing.Any
        return {k: _decode(val_tp, v) for k, v in value.items()}
    if tp is Path:
        return Path(value)
    return value


class ConfigBase:
    """Mixin giving dataclass configs dict/YAML round-trip."""

    def to_dict(self) -> dict:
        return _encode(self)

    @classmethod
    def from_dict(cls, data: dict):
        return _decode(cls, data)

    def to_yaml(self) -> str:
        return yaml.safe_dump({"__config__": type(self).__name__, **self.to_dict()},
                              sort_keys=False)

    @classmethod
    def from_yaml(cls, text: str):
        data = yaml.safe_load(text)
        data.pop("__config__", None)
        return cls.from_dict(data)

    def save(self, path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(self.to_yaml())

    @classmethod
    def load(cls, path):
        return cls.from_yaml(Path(path).read_text())

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# ---------------------------------------------------------------------------
# Model components
# ---------------------------------------------------------------------------

@dataclass
class HashEncodingConfig(ConfigBase):
    """One multiresolution hash encoding (reference: hash_ensemble.py:32-52)."""

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.4472692012786865
    interpolation: str = "Linear"


@dataclass
class HashEnsembleConfig(ConfigBase):
    """Ensemble of hash encodings blended by a per-timestep latent code
    (reference: hash_ensemble.py:55-66)."""

    n_hash_encodings: int = 32
    hash_encoding: HashEncodingConfig = field(default_factory=HashEncodingConfig)
    disable_initial_hash_ensemble: bool = False
    use_soft_transition: bool = False


@dataclass
class SE3DeformationFieldConfig(ConfigBase):
    """SE(3) warp field (reference: deformation_field.py:15-21)."""

    n_freq_pos: int = 7
    warp_code_dim: int = 128
    mlp_num_layers: int = 6
    mlp_layer_width: int = 128
    skip_connections: Tuple[int, ...] = (4,)


@dataclass
class SamplingConfig(ConfigBase):
    """Fixed-shape occupancy-grid ray marching (TPU redesign of nerfacc's
    packed DDA sampling, reference: nersemble_volumetric_sampler.py:44-135).

    XLA requires static shapes, so instead of a variable number of samples per
    ray we march ``max_candidates_per_ray`` uniform steps, look up the binary
    occupancy grid, and compact the occupied candidates to the front of a
    ``max_samples_per_ray``-slot buffer per ray.
    """

    max_samples_per_ray: int = 256
    max_candidates_per_ray: int = 1024
    # global sample compaction: evaluate only ceil(R * S * fraction / 128)*128
    # samples per batch, picked valid-first in slot-major order (the far tail
    # is dropped uniformly per ray). 1.0 disables compaction. The per-batch
    # overflow count is reported as the num_budget_dropped diagnostic.
    global_budget_fraction: float = 1.0
    # adaptive training budget: periodically re-size the compaction budget to
    # headroom x the MEASURED per-batch valid-sample count (quantized, so the
    # step re-jits only a handful of times per run). As the occupancy grid
    # carves, real fill falls to a few % of R*S — the budget follows it.
    # Applies to the train step only; eval uses global_budget_fraction.
    adaptive_budget: bool = True
    # 1.15 (round 5, was 1.3): every budget row above the true fill is dead
    # gather/scatter work — at the converged static fill (~63k) the old
    # 1.3-headroom R*S/32-quantized budget (98,304) carried 36% padding.
    # The tighter headroom is safe because the trainer now GROWS the budget
    # within ~25 steps of any sampled step that drops >2% of its samples
    # (trainer._maybe_adapt_budget); steady-state fill fluctuation measured
    # +/-5% (QUALITY_r3/r4 drop diagnostics).
    adaptive_budget_headroom: float = 1.15
    adaptive_budget_interval: int = 500  # steps between re-evaluations
    # Eval-time coarse prefilter (render-path sampler wall, PERF.md render
    # section): probe a one-cell-DILATED occupancy grid every
    # ``eval_prefilter_stride`` candidate steps to find each ray's first
    # occupied t, then march only ``eval_fine_candidates`` fine steps from
    # one stride before it. Dilation makes the coarse probe conservative
    # (cannot miss an occupied cell); rays whose occupied span outruns the
    # fine window lose only far-tail samples (transmittance there is
    # negligible on a carved grid). Training always marches the full span.
    eval_coarse_prefilter: bool = True
    eval_prefilter_stride: int = 8
    eval_fine_candidates: int = 512
    # Eval-time per-ray sample-slot cap (t-ordered: keeps the NEAREST
    # occupied samples). MEASURED HARMFUL on a 4k-step quality checkpoint
    # (capped-64 render: 15.5 dB vs the uncapped 25.1 dB vs GT): a
    # partially-carved grid marks long empty runs in front of the surface,
    # which pushes the surface past any fixed slot cap. Kept as an opt-in
    # knob for tightly-carved grids; the DEFAULT eval-tail cut is the
    # sigma-probed early termination below, which spends a cheap coarse
    # density pass to find where transmittance actually collapses.
    # -1 = uncapped. Training always uses max_samples_per_ray.
    eval_max_samples_per_ray: int = -1
    # Eval-time transmittance early termination (the fixed-shape analogue
    # of nerfacc's sampling early stop): probe the field density at every
    # ``eval_termination_probe_stride``-th compacted sample slot (its own
    # budget = budget/stride), accumulate coarse transmittance, and drop
    # every sample behind the point where T falls below this threshold
    # (+ one coarse group of safety margin). Samples behind a terminated
    # surface render nothing but dominate eval field cost (measured 81
    # marked samples per object ray vs ~10 contributing). 0 disables.
    eval_early_stop_trans: float = 1e-4
    eval_termination_probe_stride: int = 4
    # Strided eval marching: probe a one-cell-DILATED grid every k-th
    # candidate over the FULL span (one lookup vouches for k neighbors; no
    # coarse/fine split needed). The occupancy probes are scalar bool
    # gathers — the sampler-side render wall on small frames (~93 ms/frame
    # at stride 2 + two-phase; PERF.md render table, small-frame row) — so
    # probe count is the lever. At reference scale on a dense scene the
    # wall moves to sample evaluation instead (RENDER_r04.json).
    # Conservative superset of the exact march when (stride/2) *
    # render_step_size <= one base-level cell (a probe then sits within the
    # 1-cell dilation margin of every sample it vouches for) — the caller
    # clamps the stride to that bound (flagship geometry: safe up to 6).
    # Extra near-boundary samples this admits carry the field's real (low)
    # density there and are removed by the same alpha_thre pruning the
    # reference applies. 1 = exact per-candidate lookups (the two-phase
    # coarse prefilter then handles the span reduction instead).
    eval_probe_stride: int = 4
    # Eval-time RAY packing: before chunking a frame, slab-test every ray
    # against the (conservatively expanded) world AABB of the occupied grid
    # cells and render only the hits; misses get exact background without
    # evaluating anything (ops/sampling.occupied_world_aabb has the proof).
    # At reference framing the head fills a minority of the 2200x3208 frame,
    # so this cuts whole-frame render cost by the background fraction —
    # sampler probes, top_k, field eval, everything. The reference renders
    # every pixel through get_outputs_for_camera_ray_bundle (util/render.py:
    # 13-73); packing changes no output value, only skips provably-empty work.
    eval_ray_packing: bool = True
    # hard cap on how far the budget may GROW, in units of sample chunks
    # (max_n_samples_per_batch): every budget sample stores its encode
    # residuals across the lax.map (~2.5 KB/sample with the folded BH + bf16
    # CG residuals), so an uncapped early-training budget (un-carved grid =>
    # fill ~ R*S) OOMs the flagship model. The trainer never caps BELOW the
    # R*S*fraction formula budget (which provably fits — it is what the
    # step compiles with at startup). MEASURED round 4: the flagship
    # dynamic (418M-param 32-table ensemble) ran 500 warmup steps at the
    # formula budget 131,072 and OOMed the moment the adaptive budget grew
    # to 393,216 (= 4 chunks) on the 16 GB chip — growth past the formula
    # budget is what this cap bounds. Budget overflow is dropped
    # farthest-slots-first and is transient (the grid carves within ~1k
    # steps; the 20k static quality run converged to 26.9 dB through the
    # same warmup drops). -1 = uncapped. NOTE: the FORMULA budget itself is
    # not capped by this knob — a global_budget_fraction too large for HBM
    # must be lowered directly (the cap only bounds adaptive growth above
    # the formula, so "provably fits" holds only for configs that already
    # compile at the formula budget).
    adaptive_budget_max_chunks: int = 1


@dataclass
class ModelConfig(ConfigBase):
    """Full dynamic-NeRF model config (reference: nersemble_instant_ngp.py:39-76
    + models/base.py:15-32 + nersemble_nerfacto_field.py:32-62)."""

    # Sequence / conditioning
    n_timesteps: int = 1
    latent_dim_time: int = 32  # must equal n_hash_encodings when ensemble is on
    spherical_harmonics_degree: int = 0

    # Hash ensemble
    use_hash_ensemble: bool = False
    hash_ensemble: Optional[HashEnsembleConfig] = None

    # Deformation field
    use_deformation_field: bool = False
    deformation_field: Optional[SE3DeformationFieldConfig] = None
    use_separate_deformation_time_embedding: bool = True

    # Field architecture (density/color MLPs)
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    base_resolution: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    use_appearance_embedding: bool = False
    appearance_embedding_dim: int = 32
    num_images: int = 0  # filled by the trainer (train cameras x timesteps)

    # Window schedulers (coarse-to-fine)
    window_deform_begin: int = 0
    window_deform_end: int = 0
    window_hash_encodings_begin: int = 0
    window_hash_encodings_end: int = 1

    # Per-sample compute chunking: the deform+field pipeline processes at most
    # this many samples at once (lax.map over rematerialized chunks), bounding
    # the ~[chunk, L*8*F] hash-gather buffers in HBM (reference analogue:
    # max_n_samples_per_batch, nersemble_nerfacto_field.py:259). -1 = no
    # chunking. Chunks are EXPENSIVE on TPU: each lax.map iteration re-reads
    # and re-accumulates the [E, 2W] table gradient (measured ~55 ms/chunk on
    # v5e for the flagship table), so use the largest chunk that fits HBM.
    # 2^16 measured best (2 chunks at the benched budget): 1261 -> 572 ms/step
    # vs 2^13.
    max_n_samples_per_batch: int = 2 ** 16

    # Ray marching
    near_plane: float = 0.2
    far_plane: float = 1e3
    render_step_size: float = 0.011
    cone_angle: float = 0.0
    alpha_thre: float = 1e-2
    early_stop_eps: float = 0.0
    occ_thre: float = 1e-2
    disable_occupancy_grid: bool = False
    occupancy_grid_ema_decay: float = 0.95
    occupancy_grid_warmup_steps: int = 256
    grid_resolution: int = 128
    grid_levels: int = 1
    background_color: str = "white"
    sampling: SamplingConfig = field(default_factory=SamplingConfig)

    # View-frustum culling
    use_view_frustum_culling: bool = False
    view_frustum_culling: int = 2

    # Scene box (world AABB, [[min],[max]])
    scene_box: List[List[float]] = field(
        default_factory=lambda: [[-2.5, -2.0, -2.5], [2.5, 3.0, 2.0]])

    # Losses (reference: models/base.py:15-32)
    use_masked_rgb_loss: bool = False
    alpha_mask_threshold: float = 0.5
    lambda_alpha_loss: float = 0.0
    lambda_empty_loss: float = 0.0
    lambda_near_loss: float = 0.0
    lambda_depth_loss: float = 0.0
    lambda_dist_loss: float = 0.0
    eps_depth_initial: float = 0.9
    eps_depth_final: float = 0.01
    eps_depth_begin_step: int = 0
    eps_depth_end_step: int = 10000
    dist_loss_max_rays: int = 5000

    # Numerics
    compute_dtype: str = "bfloat16"  # MLP/hash compute dtype; densities are f32
    param_dtype: str = "float32"
    # dtype of the z-paired hash-table gather operand (built per step from the
    # f32 canonical table; tcnn runs its hash grids in fp16 — same class)
    table_dtype: str = "bfloat16"
    # Run MLP chains as fused Pallas kernels on TPU (jnp fallback elsewhere)
    use_fused_mlp: bool = True
    # Shard the hash-ensemble table axis over the mesh (tensor parallelism;
    # set by the trainer from ParallelConfig.shard_hash_tables)
    shard_hash_tables: bool = False


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------

@dataclass
class DataConfig(ConfigBase):
    """Dataset + ray batching config (reference: nersemble_dataparser.py:33-64,
    nersemble_datamanager.py:13-38)."""

    participant_id: int = -1
    sequence_name: str = ""
    n_timesteps: int = 1
    n_cameras: int = 12
    skip_timesteps: int = 1
    start_timestep: int = 0
    max_eval_timesteps: int = 3
    downscale_factor: int = 2
    scale_factor: float = 1.0

    foreground_only: bool = True
    use_view_frustum_culling: bool = True
    use_depth_maps: bool = False
    use_color_correction: bool = True
    use_alpha_maps: bool = False
    alpha_channel_color: str = "white"

    train_num_rays_per_batch: int = 4096
    eval_num_rays_per_batch: int = 1024
    train_num_images_to_sample_from: int = 24
    train_num_times_to_repeat_images: int = 20
    max_cached_items: int = 10000
    use_cache_compression: bool = False


# ---------------------------------------------------------------------------
# Optimization / training
# ---------------------------------------------------------------------------

@dataclass
class OptimizerConfig(ConfigBase):
    """Adam + StepLR per param group (reference: train_nersemble.py:243-256)."""

    lr: float = 5e-3
    eps: float = 1e-15
    weight_decay: float = 0.0
    scheduler_step_size: int = 20000
    scheduler_gamma: float = 0.8


@dataclass
class ParallelConfig(ConfigBase):
    """Device-mesh layout. Rays are sharded over the 'data' axis; XLA inserts
    the gradient psum over ICI. (TPU-native replacement for the reference's
    dormant single-GPU DDP plumbing, SURVEY.md section 2c.)"""

    data_axis_size: int = -1  # -1: use all available devices
    shard_hash_tables: bool = False  # optional TP over the table axis
    # ZeRO-style sharding of the hash table's Adam moments over the data
    # axis (entry-axis shards). Math-identical to replicated state (GSPMD
    # inserts the collectives); frees ~2/3 of the table's optimizer HBM per
    # chip — the moments are the largest state after the params themselves.
    shard_table_optimizer: bool = True
    # ZeRO-3 entry-sharded table pipeline (the 8-chip table-gradient layout,
    # PERF.md trajectory): the f32 master table AND its Adam moments live
    # sharded [E/devices, W] over the data axis. Forward casts the shard to
    # bf16 and all-gathers it (half the bytes of an f32 gather) before the
    # quad build; backward reduce-scatters the folded bf16 table gradient so
    # the fused Adam update runs on the local entry shard. Single-device:
    # no-op. Takes precedence handling: disabled when shard_hash_tables (TP)
    # is active.
    shard_table_params: bool = True


@dataclass
class TrainConfig(ConfigBase):
    """Top-level training config (reference: nersemble_trainer_config.py:8-22 +
    train_nersemble.py:146-260)."""

    run_name: str = ""
    experiment_name: str = ""
    method_name: str = "nersemble"
    project_name: str = "nersemble"
    output_dir: str = ""

    max_num_iterations: int = 300001
    steps_per_save: int = 50000
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 20000
    steps_per_eval_all_images: int = 50000
    steps_per_log: int = 10
    save_only_latest_checkpoint: bool = True
    seed: int = 19980801
    vis: str = "csv"  # csv | tensorboard | none | viewer (live web viewer)
    viewer_port: int = 7007

    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optimizers: Dict[str, OptimizerConfig] = field(default_factory=lambda: {
        "fields": OptimizerConfig(lr=5e-3, scheduler_gamma=0.8),
        "deformation_field": OptimizerConfig(lr=1e-3, scheduler_gamma=0.5),
        "embeddings": OptimizerConfig(lr=5e-3, scheduler_gamma=0.8),
    })
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    # Resume
    load_dir: Optional[str] = None
    load_step: Optional[int] = None
