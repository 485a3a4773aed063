"""The NeRSemble dynamic radiance-field model (functional orchestrator).

Reference: src/nersemble/nerfstudio/models/nersemble_instant_ngp.py:78-514.
Composes: occupancy-grid ray marching -> per-timestep latent lookup -> SE(3)
warp into canonical space -> hash-ensemble field -> alpha compositing ->
supervision losses.

Everything is functional: ``params`` (trained) and ``grid_occs`` (EMA state)
are pytrees; methods are pure and jit/pjit-friendly. Scheduled scalars
(coarse-to-fine windows, depth-band epsilon) arrive via a ``sched`` dict of
traced scalars so schedule changes never retrigger compilation.

World/normalized-space composition quirk preserved from the reference
(deformation_field.py:156-166 + nersemble_nerfacto_field.py:257): the warp is
computed on AABB-normalized positions, its offset is added to the *world*
position, and the field re-normalizes — so the effective normalized-space
offset is offset/extent.
"""

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nersemble_tpu.config import ModelConfig
from nersemble_tpu.models.deformation import deformation_offsets, init_deformation_field
from nersemble_tpu.models.field import (
    build_levels,
    field_density,
    field_rgb,
    init_field,
    prepare_field,
)
from nersemble_tpu.ops import losses as L
from nersemble_tpu.ops.distortion import distortion_loss
from nersemble_tpu.ops.occupancy import occupancy_binaries, update_occupancy_grid
from nersemble_tpu.ops.rendering import (
    render_accumulation,
    render_depth_expected,
    render_expected_value,
    render_rgb,
    render_weights,
)
from nersemble_tpu.ops.sampling import (compact_samples,
                                        compact_samples_monotone, march_rays,
                                        permute_rows, scatter_rows_back)

_BACKGROUNDS = {"white": (1.0, 1.0, 1.0), "black": (0.0, 0.0, 0.0)}


class NeRSembleModel:
    """Holds static configuration; all compute methods are pure functions."""

    def __init__(self, config: ModelConfig):
        self.config = config
        self.levels = build_levels(config)
        scene_box = np.asarray(config.scene_box, np.float32)
        self.aabb_min = jnp.asarray(scene_box[0])
        self.aabb_max = jnp.asarray(scene_box[1])
        self.background = jnp.asarray(_BACKGROUNDS[config.background_color],
                                      jnp.float32)
        self.compute_dtype = jnp.dtype(config.compute_dtype)
        # ZeRO-3 entry-sharded table layout: set by the trainer to the
        # replicated NamedSharding of its mesh (not config — shardings are
        # runtime objects). prepare_field then places the bf16 all-gather
        # between the shard-local cast and the quad rolls.
        self.table_replicate_sharding = None
        # grid_levels > 1: nerfacc-style cascade, level l covers the base box
        # scaled by 2^l (reference config surface: train_nersemble.py:102;
        # nerfacc OccGridEstimator(levels=...)). State is flat [L*G^3].
        self.n_grid_cells = config.grid_levels * config.grid_resolution ** 3

        if config.use_hash_ensemble:
            assert config.latent_dim_time == config.hash_ensemble.n_hash_encodings, \
                "latent_dim_time must equal n_hash_encodings for the blend"
        # candidate comb must span the (coarsest-level) scene box, or rays
        # terminate mid-scene
        diag = float(np.linalg.norm(scene_box[1] - scene_box[0])) \
            * (2.0 ** (config.grid_levels - 1))
        needed = self._candidates_to_span(diag)
        if config.sampling.max_candidates_per_ray == -1:
            # auto-size (rounded up to a lane multiple)
            config.sampling.max_candidates_per_ray = (needed + 127) // 128 * 128
        elif config.sampling.max_candidates_per_ray < needed:
            print(f"[nersemble-tpu] WARNING: max_candidates_per_ray="
                  f"{config.sampling.max_candidates_per_ray} candidates cannot "
                  f"span the {diag:.2f}-unit scene-box diagonal — rays will "
                  f"stop mid-scene. Use -1 to auto-size (= {needed}).")

    def _candidates_to_span(self, span: float) -> int:
        """Candidate steps needed to cover ``span`` world units from the
        worst-case (smallest growth) entry point. With cone_angle=0 this is
        span/step; with cone_angle>0 steps grow as max(t*cone, step)
        (nerfacc), simulated here once at init on the host."""
        cfg = self.config
        if cfg.cone_angle <= 0:
            return int(np.ceil(span / cfg.render_step_size))
        t = max(cfg.near_plane, cfg.render_step_size)
        end, n = t + span, 0
        while t < end:
            t += max(t * cfg.cone_angle, cfg.render_step_size)
            n += 1
        return n

    # -- parameters ----------------------------------------------------------

    def init_params(self, rng) -> Dict:
        cfg = self.config
        f_rng, d_rng, t_rng, td_rng = jax.random.split(rng, 4)
        params = {"field": init_field(f_rng, cfg, self.levels)}
        if cfg.use_deformation_field:
            params["deformation"] = init_deformation_field(d_rng, cfg.deformation_field)
        if cfg.use_deformation_field or cfg.use_hash_ensemble:
            # init N(0, 0.01/sqrt(dim)) (reference: nersemble_instant_ngp.py:115-125)
            params["time_embedding"] = jax.random.normal(
                t_rng, (cfg.n_timesteps, cfg.latent_dim_time)) \
                * (0.01 / math.sqrt(cfg.latent_dim_time))
            if cfg.use_separate_deformation_time_embedding and cfg.use_deformation_field:
                d_dim = cfg.deformation_field.warp_code_dim
                params["time_embedding_deformation"] = jax.random.normal(
                    td_rng, (cfg.n_timesteps, d_dim)) * (0.01 / math.sqrt(d_dim))
        return params

    def init_grid_occs(self) -> jnp.ndarray:
        return jnp.zeros((self.n_grid_cells,), jnp.float32)

    def param_groups(self, params) -> Dict[str, list]:
        """Leaf path prefixes per optimizer group
        (reference: nersemble_instant_ngp.py:502-514)."""
        groups = {"fields": ["field"], "deformation_field": [], "embeddings": []}
        if "deformation" in params:
            groups["deformation_field"].append("deformation")
        for key in ("time_embedding", "time_embedding_deformation"):
            if key in params:
                groups["embeddings"].append(key)
        return groups

    # -- conditioning --------------------------------------------------------

    def _time_codes(self, params, timesteps):
        """Per-ray latent codes from integer timesteps."""
        tc = tc_def = None
        if "time_embedding" in params:
            tc = params["time_embedding"][timesteps]
            if "time_embedding_deformation" in params:
                tc_def = params["time_embedding_deformation"][timesteps]
            else:
                tc_def = tc
        return tc, tc_def

    # -- chunked per-sample evaluation ---------------------------------------

    def _chunked_samples(self, body, inputs: tuple, n: int):
        """Run ``body(*inputs)`` over the leading sample axis in chunks of
        ``max_n_samples_per_batch`` via lax.map. Bounds the [chunk, L*8*W]
        gather buffers in HBM — the TPU analogue of the reference's
        max_n_samples_per_batch chunker (util/chunker.py:7-28).

        No chunk-level remat: the hash encode's custom VJP keeps only small
        blend residuals (no re-gather in backward), and the fused MLPs
        rematerialize internally — wrapping the chunk in jax.checkpoint would
        force the expensive gather to run again in the backward pass."""
        chunk = self.config.max_n_samples_per_batch
        if chunk == -1 or n <= chunk:
            return body(*inputs)
        k = -(-n // chunk)
        # equal-size chunks: padding every chunk to the max size would waste
        # up to chunk-1 evaluated rows (e.g. a 98,304 budget at chunk 2^16
        # would gather/scatter 131,072 rows — the entire budget saving);
        # instead split n into k equal 256-aligned pieces (98,304 -> 2x49,152)
        chunk = -(-(-(-n // k)) // 256) * 256
        pad = k * chunk - n

        def prep(a):
            if pad:
                a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)])
            return a.reshape(k, chunk, *a.shape[1:])

        stacked = tuple(prep(a) for a in inputs)
        out = jax.lax.map(lambda args: body(*args), stacked)
        return jax.tree_util.tree_map(
            lambda o: o.reshape(k * chunk, *o.shape[2:])[:n], out)

    # -- density with deformation composed (for occupancy + sampler) ---------

    def density_at(self, params, positions, timesteps, sched):
        """sigma at [N, 3] world positions / [N] integer timesteps
        (reference field_density_fn: nersemble_instant_ngp.py:235-266)."""
        cfg = self.config
        # z-paired gather operand, built ONCE (outside the chunk loop)
        fparams = prepare_field(params["field"], cfg, self.levels,
                                replicate_sharding=self.table_replicate_sharding)

        def body(positions, timesteps):
            tc, tc_def = self._time_codes(params, timesteps)
            warped = self._warp_positions(params, positions, tc_def, sched)
            density, _ = field_density(fparams, warped, tc, cfg,
                                       self.levels, self.aabb_min, self.aabb_max,
                                       window_hash=sched.get("window_hash"),
                                       compute_dtype=self.compute_dtype)
            return density

        return self._chunked_samples(body, (positions, timesteps),
                                     positions.shape[0])

    def _warp_positions(self, params, positions, tc_def, sched):
        cfg = self.config
        if not cfg.use_deformation_field:
            return positions
        norm = (positions - self.aabb_min) / (self.aabb_max - self.aabb_min)
        offsets = deformation_offsets(params["deformation"], norm, tc_def,
                                      cfg.deformation_field,
                                      window_param=sched.get("window_deform"),
                                      compute_dtype=self.compute_dtype,
                                      use_fused_mlp=cfg.use_fused_mlp)
        # world-space composition quirk (see module docstring)
        return positions + offsets

    # -- occupancy grid ------------------------------------------------------

    def occupancy_grid_update(self, params, grid_occs, rng, sched, warmup: bool):
        """One EMA update (reference: nersemble_instant_ngp.py:184-196)."""
        cfg = self.config

        def occ_eval_fn(positions, time_rng):
            timesteps = jax.random.randint(time_rng, (positions.shape[0],), 0,
                                           cfg.n_timesteps)
            return self.density_at(params, positions, timesteps, sched) \
                * cfg.render_step_size

        return update_occupancy_grid(
            grid_occs, occ_eval_fn, rng, cfg.grid_resolution,
            self.aabb_min, self.aabb_max, cfg.occ_thre,
            cfg.occupancy_grid_ema_decay, warmup=warmup)

    def binaries(self, grid_occs, frustum_grid=None):
        cfg = self.config
        g, levels = cfg.grid_resolution, cfg.grid_levels
        shape = (g, g, g) if levels == 1 else (levels, g, g, g)
        if cfg.disable_occupancy_grid:
            b = jnp.ones(shape, bool)
            if frustum_grid is not None:
                if levels == 1:
                    b = b & frustum_grid
                else:
                    # the frustum grid is laid out on the BASE level's AABB;
                    # coarser cascade levels cover a box scaled 2^l and lie
                    # outside every training frustum by construction — mirror
                    # occupancy_binaries' at[:G^3] handling
                    b = b.at[0].set(frustum_grid)
            return b
        return occupancy_binaries(grid_occs, cfg.occ_thre,
                                  frustum_grid).reshape(shape)

    # -- rendering -----------------------------------------------------------

    def render_rays(self, params, rays: Dict, binaries, sched: Dict,
                    rng=None, train: bool = True,
                    budget: Optional[int] = None,
                    fparams=None) -> Dict:
        """Render a fixed-shape ray batch.

        rays: origins [R,3], directions [R,3], timesteps [R] int32,
        optional camera_indices [R] int32. ``budget`` overrides the
        compaction sample budget (static python int; None derives it from
        sampling.global_budget_fraction — see the adaptive-budget logic in
        engine/trainer.py). ``fparams``: optionally a PRE-BUILT
        ``prepare_field(params["field"], ...)`` result — at eval the quad
        gather operand doesn't change between an image's chunks, so the
        caller builds it once per image instead of once per chunk
        (engine/trainer.render_image; PERF.md render section).
        """
        cfg = self.config
        origins, directions = rays["origins"], rays["directions"]
        R = origins.shape[0]
        S = cfg.sampling.max_samples_per_ray
        if not train and cfg.sampling.eval_max_samples_per_ray > 0:
            # fixed-shape stand-in for nerfacc's eval transmittance early
            # termination — see SamplingConfig.eval_max_samples_per_ray
            S = min(S, cfg.sampling.eval_max_samples_per_ray)
        n_cand = cfg.sampling.max_candidates_per_ray

        jitter = None
        if train and rng is not None:
            jitter = jax.random.uniform(rng, (R,))

        # eval-time coarse prefilter (render wall, PERF.md render section):
        # find each ray's first occupied t on a dilated grid at a coarse
        # stride, then march a short fine window from there — shrinks the
        # top_k/compaction input ~n_cand/eval_fine_candidates x.
        scfg = cfg.sampling
        start_steps = None
        march_binaries, occupancy_stride = binaries, 1
        if (not train and scfg.eval_coarse_prefilter and binaries is not None
                and not cfg.disable_occupancy_grid):
            from nersemble_tpu.ops.sampling import (
                coarse_entry_steps,
                dilate_binaries,
                march_range,
            )
            # strided probing on a dilated grid (see march_rays
            # occupancy_stride): safe while a probe stays within one
            # base-level cell of every sample it vouches for —
            # (stride/2) * dt <= cell. cone_angle grows the step with t, so
            # the bound doesn't hold globally there: fall back to exact.
            stride = 1
            if scfg.eval_probe_stride > 1 and cfg.cone_angle == 0.0:
                box = np.asarray(cfg.scene_box, np.float32)  # static
                cell = float(np.min(box[1] - box[0])) / cfg.grid_resolution
                stride = min(scfg.eval_probe_stride,
                             max(int(2.0 * cell / cfg.render_step_size), 1))
            if stride > 1:
                # single-phase strided march over the FULL span: fewer
                # probes than any coarse/fine split (probes/ray = n_cand /
                # stride), and no entry-point pass at all
                occupancy_stride = stride
                march_binaries = dilate_binaries(binaries)
            elif scfg.eval_fine_candidates < n_cand:
                # exact probing: two-phase coarse prefilter to shrink the
                # fine span (cone-angle marching lands here)
                t_near, t_far = march_range(origins, directions,
                                            self.aabb_min, self.aabb_max,
                                            binaries, cfg.near_plane,
                                            cfg.far_plane)
                start_steps = coarse_entry_steps(
                    origins, directions, t_near, t_far,
                    dilate_binaries(binaries), self.aabb_min, self.aabb_max,
                    cfg.render_step_size, n_cand,
                    scfg.eval_prefilter_stride, cfg.cone_angle)
                n_cand = max(scfg.eval_fine_candidates, S)

        samples, info = march_rays(
            origins, directions, self.aabb_min, self.aabb_max,
            cfg.render_step_size, n_cand, S, binaries=march_binaries,
            near_plane=cfg.near_plane, far_plane=cfg.far_plane, jitter=jitter,
            cone_angle=cfg.cone_angle, start_steps=start_steps,
            occupancy_stride=occupancy_stride)

        timesteps = rays.get("timesteps")
        if timesteps is None:
            timesteps = jnp.zeros((R,), jnp.int32)
        cam_idx = rays.get("camera_indices")
        if cam_idx is None:
            cam_idx = jnp.zeros((R,), jnp.int32)

        # z-paired gather operand, built ONCE (outside the chunk loop)
        if fparams is None:
            fparams = prepare_field(
                params["field"], cfg, self.levels,
                replicate_sharding=self.table_replicate_sharding)

        def body(pos, ts, dirs, cam):
            tc, tc_def = self._time_codes(params, ts)
            offsets = None
            if cfg.use_deformation_field:
                norm = (pos - self.aabb_min) / (self.aabb_max - self.aabb_min)
                offsets = deformation_offsets(
                    params["deformation"], norm, tc_def, cfg.deformation_field,
                    window_param=sched.get("window_deform"),
                    compute_dtype=self.compute_dtype,
                    use_fused_mlp=cfg.use_fused_mlp)
                pos = pos + offsets
            density, geo = field_density(fparams, pos, tc, cfg,
                                         self.levels, self.aabb_min,
                                         self.aabb_max,
                                         window_hash=sched.get("window_hash"),
                                         compute_dtype=self.compute_dtype)
            rgb = field_rgb(fparams, dirs, geo, cfg,
                            camera_indices=cam, train=train,
                            compute_dtype=self.compute_dtype)
            if offsets is None:
                offsets = jnp.zeros_like(pos)
            return density, rgb, offsets

        if budget is None:
            frac = cfg.sampling.global_budget_fraction
            budget = -(-int(R * S * frac) // 128) * 128 \
                if 0 < frac < 1.0 else R * S
        budget = min(budget, R * S)

        # ONE row gather for all per-ray inputs. Int columns ride as f32
        # VALUES (exact for |v| < 2^24), NOT bitcast bit patterns: int32
        # 1..2^23-ish bitcast to f32 are SUBNORMALS, and the TPU flushes
        # subnormals to zero anywhere the fused gather touches arithmetic —
        # measured live: 9,400 flagship dynamic steps in which time-embedding
        # rows 1..15 received bitwise-zero Adam moments (every ray decoded as
        # timestep 0 / camera 0 on device) while the identical path on CPU,
        # which preserves denormals, passes every gradient test. This single
        # encoding choice silently reduced every dynamic run since round 2 to
        # a static mean-scene fit (the flat ~14 dB hold-out curves).
        ray_pack = jnp.concatenate([
            origins, directions,
            timesteps.astype(jnp.float32)[:, None],
            cam_idx.astype(jnp.float32)[:, None],
        ], axis=1)

        # ---- eval sigma-probed early termination ---------------------------
        # The fixed-shape analogue of nerfacc's eval transmittance early
        # stop (reference sampler: nersemble_volumetric_sampler.py:95-108's
        # sigma_fn loop): probe density at every ps-th compacted slot,
        # accumulate coarse transmittance, and drop samples behind the point
        # where T collapses. Marked-but-occluded interior samples dominate
        # eval cost (measured 81 marked/object-ray vs ~10 contributing).
        # Conservative: coarse slots that miss the probe budget contribute
        # sigma=0 (no premature termination) and the group where T crosses
        # the threshold is always kept.
        n_samples_out = info["n_samples_per_ray"]
        # march_rays compacts valid candidates to a per-ray slot PREFIX, so
        # the mask is monotone until the sigma-probe termination (eval only)
        # punches holes in it — that gates the sort-free compaction below
        mask_monotone = True
        ps = scfg.eval_termination_probe_stride
        if (not train and scfg.eval_early_stop_trans > 0
                and budget < R * S and ps > 1 and S >= 2 * ps):
            from nersemble_tpu.ops.rendering import exclusive_cumsum
            Sc = S // ps
            sub_mask = samples.mask[:, :Sc * ps:ps]
            sub_t = ((samples.t_starts + samples.t_ends)
                     * 0.5)[:, :Sc * ps:ps]
            deltas = (samples.t_ends - samples.t_starts) * samples.mask
            delta_c = deltas[:, :Sc * ps].reshape(R, Sc, ps).sum(-1)
            bc = min(-(-max(budget // ps, 128) // 128) * 128, R * Sc)
            # sub_mask is a strided view of march_rays' prefix mask — still
            # per-ray monotone, so the sort-free staircase compaction applies
            sel_c, kept_c = compact_samples_monotone(sub_mask, bc)
            tmid_c = jnp.take(sub_t.T.reshape(-1), sel_c)
            picked_c = jnp.take(ray_pack, sel_c % R, axis=0)
            pos_p = picked_c[:, 0:3] + picked_c[:, 3:6] * tmid_c[:, None]
            ts_p = picked_c[:, 6].astype(jnp.int32)

            def density_body(pos, ts):
                tc, tc_def = self._time_codes(params, ts)
                pos = self._warp_positions(params, pos, tc_def, sched)
                density, _ = field_density(
                    fparams, pos, tc, cfg, self.levels, self.aabb_min,
                    self.aabb_max, window_hash=sched.get("window_hash"),
                    compute_dtype=self.compute_dtype)
                return density

            sigma_p = self._chunked_samples(density_body, (pos_p, ts_p), bc)
            # route back to [R, Sc] (width-8 pad: W=1 scatters hit the
            # scalar slow path)
            sig_pack = jnp.concatenate(
                [sigma_p[:, None], jnp.zeros((bc, 7), sigma_p.dtype)], axis=1)
            sig_back = scatter_rows_back(sig_pack, sel_c, R * Sc)[:, 0]
            sigma_c = sig_back.reshape(Sc, R).T * kept_c
            trans_c = jnp.exp(-exclusive_cumsum(sigma_c * delta_c, axis=-1))
            alive = trans_c >= scfg.eval_early_stop_trans  # [R, Sc]
            # one extra coarse group of margin (probe sigma is a one-point
            # estimate of the group)
            alive = alive | jnp.pad(alive[:, :-1], ((0, 0), (1, 0)),
                                    constant_values=True)
            fine_keep = jnp.repeat(alive, ps, axis=1)
            if S > Sc * ps:
                fine_keep = jnp.concatenate(
                    [fine_keep,
                     jnp.broadcast_to(alive[:, -1:], (R, S - Sc * ps))], 1)
            samples = samples._replace(mask=samples.mask & fine_keep)
            n_samples_out = jnp.sum(samples.mask, -1)
            mask_monotone = False

        n_budget_dropped = jnp.int32(0)
        if budget < R * S:
            # global compaction: evaluate only `budget` samples, picked from
            # the valid slots across the whole batch (see compact_samples)
            if mask_monotone:
                # sort-free staircase compaction (saves the ~14 ms/step
                # slot-major argsort over R*S keys — the training hot path)
                sel, kept = compact_samples_monotone(samples.mask, budget)
                inv = order = None
            else:
                sel, inv, order, kept = compact_samples(samples.mask, budget)
            n_budget_dropped = jnp.sum(samples.mask) - jnp.sum(kept)
            samples = samples._replace(mask=kept)
            ray_id = sel % R
            tmid_t = ((samples.t_starts + samples.t_ends) * 0.5).T.reshape(-1)
            tmid = jnp.take(tmid_t, sel)
            picked = jnp.take(ray_pack, ray_id, axis=0)  # [budget, 8]
            pos_c = picked[:, 0:3] + picked[:, 3:6] * tmid[:, None]
            ts_c = picked[:, 6].astype(jnp.int32)
            cam_c = picked[:, 7].astype(jnp.int32)

            density_c, rgbs_c, offs_c = self._chunked_samples(
                body, (pos_c, ts_c, picked[:, 3:6], cam_c), budget)
            # route results back to [R, S] slots with a permutation gather
            # (backward is also a gather — see permute_rows)
            out_pack = jnp.concatenate([
                density_c[:, None], rgbs_c, offs_c,
                jnp.zeros((budget, 1), density_c.dtype)], axis=1)  # pad to 8
            if budget <= (R * S) // 4 or inv is None:
                # scatter `budget` rows instead of gathering all R*S rows:
                # measured scatter ~11 M rows/s at W=8 vs route-back gather
                # ~46 M rows/s over the FULL R*S — scatter wins while
                # budget < R*S/4 (ops/sampling.py scatter_rows_back; the
                # full-gather route was 187 ms/frame on the render bench,
                # PERF.md render section)
                back = scatter_rows_back(out_pack, sel, R * S)
            else:
                padded = jnp.concatenate(
                    [out_pack, jnp.zeros((R * S - budget, 8), out_pack.dtype)])
                back = permute_rows(padded, inv, order)  # [S*R, 8]
            back = back.reshape(S, R, 8).transpose(1, 0, 2)
            sigmas = back[..., 0] * samples.mask
            rgbs = back[..., 1:4].reshape(R * S, 3)
            offsets_norm = back[..., 4:7].reshape(R * S, 3)
        else:
            positions = samples.positions(origins, directions)  # [R, S, 3]
            flat_pos = positions.reshape(R * S, 3)
            flat_ts = jnp.broadcast_to(timesteps[:, None],
                                       (R, S)).reshape(R * S)
            flat_dirs = jnp.broadcast_to(directions[:, None, :],
                                         (R, S, 3)).reshape(R * S, 3)
            flat_cam = jnp.broadcast_to(cam_idx[:, None], (R, S)).reshape(R * S)
            density, rgbs, offsets_norm = self._chunked_samples(
                body, (flat_pos, flat_ts, flat_dirs, flat_cam), R * S)
            sigmas = density.reshape(R, S)
        if not cfg.use_deformation_field:
            offsets_norm = None

        # alpha_thre sample pruning (reference: nerfacc sampling's sigma_fn
        # filter, nersemble_volumetric_sampler.py:95-108 with alpha_thre=1e-2):
        # samples whose opacity falls below the threshold are dropped entirely
        # — they neither attenuate nor receive gradients, exactly like the
        # reference's no-grad sampler excluding them from the packed set.
        # This is what keeps the background clean: low-density haze stops
        # being rendered (and stops being reinforced) once it thins out.
        if cfg.alpha_thre > 0:
            delta = samples.t_ends - samples.t_starts
            alpha_raw = 1.0 - jnp.exp(-jax.lax.stop_gradient(sigmas) * delta)
            keep = alpha_raw >= cfg.alpha_thre
            samples = samples._replace(mask=samples.mask & keep)
            sigmas = sigmas * keep

        # early_stop_eps > 0: nerfacc terminates a ray once its accumulated
        # transmittance falls below eps (OccGridEstimator.sampling's sigma_fn
        # early stop, nersemble_volumetric_sampler.py:104) — the dropped
        # samples neither render nor receive gradients. T is monotone
        # non-increasing along the ray, so the drop is a per-ray suffix:
        # keep sample i iff T_i (transmittance BEFORE i, no-grad like the
        # reference's no-grad sampler) >= eps. The reference trains with
        # eps = 0 ("otherwise scene may start exploding",
        # train_nersemble.py:192), so this branch is compile-time dead in the
        # flagship config.
        if cfg.early_stop_eps > 0:
            _, trans_ng = render_weights(jax.lax.stop_gradient(sigmas),
                                         samples.t_starts, samples.t_ends,
                                         samples.mask)
            keep = trans_ng >= cfg.early_stop_eps
            samples = samples._replace(mask=samples.mask & keep)
            sigmas = sigmas * keep

        weights, trans = render_weights(sigmas, samples.t_starts, samples.t_ends,
                                        samples.mask)

        outputs = {
            "rgb": render_rgb(weights, rgbs.reshape(R, S, 3), self.background),
            "accumulation": render_accumulation(weights),
            "depth": render_depth_expected(weights, samples.t_starts, samples.t_ends),
            "weights": weights,
            "samples": samples,
            "num_samples_per_ray": n_samples_out,
            "num_dropped_per_ray": info["n_dropped_per_ray"],
            "num_budget_dropped": n_budget_dropped,
        }
        if offsets_norm is not None:
            outputs["deformation"] = render_expected_value(
                weights, offsets_norm.reshape(R, S, 3))
        return outputs

    # -- losses --------------------------------------------------------------

    def compute_losses(self, outputs: Dict, batch: Dict, sched: Dict,
                       train: bool = True) -> Dict:
        """Scaled loss dict (reference: nersemble_instant_ngp.py:366-407 +
        models/base.py:90-249). batch: rgb [R,3], optional alpha [R] in [0,1],
        optional depth [R] (0 = invalid)."""
        cfg = self.config
        samples = outputs["samples"]
        weights = outputs["weights"]
        alpha = batch.get("alpha")
        depth_gt = batch.get("depth")

        loss_dict = {
            "rgb_loss": L.masked_rgb_loss(outputs["rgb"], batch["rgb"], alpha,
                                          cfg.use_masked_rgb_loss,
                                          cfg.alpha_mask_threshold),
        }
        if cfg.lambda_alpha_loss > 0 and alpha is not None:
            loss_dict["alpha_loss"] = cfg.lambda_alpha_loss * L.alpha_loss(
                outputs["accumulation"], alpha)
        if train and depth_gt is not None:
            eps = sched.get("eps_depth", cfg.eps_depth_final)
            if cfg.lambda_empty_loss > 0:
                loss_dict["empty_loss"] = cfg.lambda_empty_loss * L.empty_loss(
                    weights, samples.t_starts, samples.t_ends, samples.mask,
                    depth_gt, eps)
            if cfg.lambda_near_loss > 0:
                loss_dict["near_loss"] = cfg.lambda_near_loss * L.near_loss(
                    weights, samples.t_starts, samples.t_ends, samples.mask,
                    depth_gt, eps)
            if cfg.lambda_depth_loss > 0:
                loss_dict["depth_loss"] = cfg.lambda_depth_loss * L.depth_loss(
                    outputs["depth"], depth_gt)
        if cfg.lambda_dist_loss > 0 and train:
            R = weights.shape[0]
            ray_mask = jnp.arange(R) < cfg.dist_loss_max_rays
            loss_dict["dist_loss"] = cfg.lambda_dist_loss * distortion_loss(
                weights, samples.t_starts, samples.t_ends, samples.mask, ray_mask)
        return loss_dict
