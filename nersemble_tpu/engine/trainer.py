"""Training engine: jitted DP train step, occupancy maintenance, eval, ckpt.

Reference: src/nersemble/nerfstudio/engine/nersemble_trainer.py:21-206 +
nerfstudio Trainer/VanillaPipeline. TPU redesign:

- The train step is ONE jitted pure function (forward + backward + Adam +
  occupancy-aware sampling) with donated params/opt-state, compiled once; all
  scheduled quantities (window params, eps_depth, group LRs) enter as traced
  scalars computed on the host per step.
- The ray batch is sharded over the mesh's data axis; XLA all-reduces grads
  over ICI (see parallel/mesh.py). bf16 compute, f32 params — no GradScaler,
  and the reference's autocast-cache gradient bug (nersemble_trainer.py:171-177)
  cannot exist under pure functions.
- Occupancy-grid EMA updates run every 16 steps as separate compiled fns
  (warm-up all-cells variant + sampled variant).
- Periodic eval renders images chunk-wise through the same render fn.
"""

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nersemble_tpu.config import TrainConfig
from nersemble_tpu.data.dataparser import NeRSembleDataParser
from nersemble_tpu.data.dataset import NeRSembleDataset
from nersemble_tpu.data.multi_view_data import NeRSembleDataManager
from nersemble_tpu.data.ray_batcher import EvalImageLoader, RayBatcher
from nersemble_tpu.engine import checkpoints
from nersemble_tpu.engine.optimizers import (
    fused_adam_update,
    group_of_param,
    make_optimizer,
)
from nersemble_tpu.engine.writer import MetricsWriter
from nersemble_tpu.models.nersemble import NeRSembleModel
from nersemble_tpu.ops.occupancy import frustum_culling_grid
from nersemble_tpu.parallel import mesh as mesh_lib
from nersemble_tpu.utils import metrics as M
from nersemble_tpu.utils.windows import generic_schedule, step_lr

OCC_UPDATE_EVERY = 16


class NeRSembleTrainer:
    def __init__(self, config: TrainConfig, model_manager=None,
                 data_location: Optional[str] = None,
                 original_image_size=None, writer: Optional[MetricsWriter] = None,
                 eval_only: bool = False):
        # eval_only: checkpoint restore skips the optimizer state (evaluate/
        # render/view CLIs never step the optimizer) — over the slow axon
        # tunnel that is ~3.3 GB of Adam moments not uploaded at startup
        self._eval_only = eval_only
        self.config = config
        self.model_manager = model_manager
        self.run_dir = Path(model_manager.get_location()) if model_manager \
            else Path(config.output_dir or ".") / (config.run_name or "run")

        # -- data ------------------------------------------------------------
        dm = NeRSembleDataManager(config.data.participant_id,
                                  config.data.sequence_name,
                                  location=data_location)
        parser_kwargs = {}
        if original_image_size is not None:
            parser_kwargs["original_image_size"] = original_image_size
        self.dataparser = NeRSembleDataParser(config.data, data_manager=dm,
                                              **parser_kwargs)
        self.train_outputs = self.dataparser.generate_outputs("train")
        self.eval_outputs = self.dataparser.generate_outputs("val")
        self.train_dataset = NeRSembleDataset(self.train_outputs, config.data)
        self.eval_dataset = NeRSembleDataset(self.eval_outputs, config.data)
        self.eval_loader = EvalImageLoader(self.eval_dataset)

        # -- model -----------------------------------------------------------
        config.model.n_timesteps = config.data.n_timesteps
        config.model.scene_box = self.train_outputs.scene_box.tolist()
        config.model.num_images = self.train_outputs.n_images

        self.mesh = mesh_lib.make_mesh(config.parallel.data_axis_size)
        self.n_devices = self.mesh.devices.size

        # optional tensor parallelism over the hash-table feature axis
        if config.parallel.shard_hash_tables:
            from nersemble_tpu.models.field import table_row_width
            row_width = table_row_width(config.model)[0]
            if row_width % self.n_devices == 0:
                config.model.shard_hash_tables = True
            else:
                print(f"[nersemble-tpu] shard_hash_tables disabled: row width "
                      f"{row_width} not divisible by {self.n_devices} devices")
        self.model = NeRSembleModel(config.model)

        # grid mask = frustum culling (host precompute), optionally ANDed with
        # the eval-time connected-component filter; passed into the jitted fns
        # as an argument so it can change after compilation.
        g = config.model.grid_resolution
        self.grid_mask = jnp.ones((g, g, g), bool)
        if config.model.use_view_frustum_culling and self.train_outputs.frustums:
            grid = frustum_culling_grid(
                self.train_outputs.frustums, config.model.grid_resolution,
                self.train_outputs.scene_box[0], self.train_outputs.scene_box[1],
                config.model.view_frustum_culling)
            self.grid_mask = jnp.asarray(grid)

        # -- state -----------------------------------------------------------
        rng = jax.random.PRNGKey(config.seed)
        self.params = self.model.init_params(rng)
        self.param_shardings = self._build_param_shardings()
        self.params = jax.device_put(self.params, self.param_shardings)
        self.optimizer = make_optimizer()
        self.opt_state = self.optimizer.init(self.params)
        # Adam moments follow the param shardings; count is replicated.
        # (optax.init creates scalars on the default device, which would
        # conflict with the mesh-committed params under jit.)
        moment_shardings = self._moment_shardings()
        self.opt_shardings = type(self.opt_state)(
            count=mesh_lib.replicated(self.mesh),
            mu=moment_shardings, nu=moment_shardings)
        self.opt_state = jax.device_put(self.opt_state, self.opt_shardings)
        self.grid_occs = self.model.init_grid_occs()
        self.start_step = 0
        self.key_to_group = group_of_param(self.model.param_groups(self.params))
        self._auto_render_budget = None  # probed lazily by render_image
        self._loaded_budget = None  # adaptive train budget from a checkpoint

        if config.load_dir is not None:
            self._load_checkpoint()

        # batcher sized to the global batch (sharded over devices)
        n_rays = config.data.train_num_rays_per_batch
        assert n_rays % self.n_devices == 0, \
            f"train_num_rays_per_batch={n_rays} must divide over {self.n_devices} devices"
        self.batcher = RayBatcher(self.train_dataset, config.data,
                                  num_rays=n_rays, seed=config.seed)

        # "viewer" starts the live web viewer alongside csv metrics
        # (reference: nerfstudio --vis viewer, train_nersemble.py:56)
        writer_mode = "csv" if config.vis == "viewer" else config.vis
        self.writer = writer or MetricsWriter(self.run_dir,
                                              enabled=config.vis != "none",
                                              mode=writer_mode)
        self._eval_batch_iter = None
        self.viewer = None
        if config.vis == "viewer":
            from nersemble_tpu.viewer import ViewerServer
            center, distance = self.viewer_defaults()
            self.viewer = ViewerServer(state={
                "run_name": config.run_name,
                "n_timesteps": config.data.n_timesteps,
                "step": self.start_step,
                "distance": distance,
            }, port=config.viewer_port)
            print(f"[nersemble-tpu] viewer: {self.viewer.url}")

        # startup model summary (reference: torchinfo.summary,
        # train_nersemble.py:277)
        from nersemble_tpu.engine.writer import param_count_summary
        counts = param_count_summary(self.params)
        print("[nersemble-tpu] parameters: "
              + "  ".join(f"{k}={v:,}" for k, v in counts.items()))
        self.writer.put_scalars(self.start_step,
                                {f"params/{k}": v for k, v in counts.items()})
        self._build_steps()

    def viewer_defaults(self):
        """(orbit center, default distance) in UNSCALED (calibration) units
        — the same units the render CLI's circle trajectory uses before the
        x scale_factor. Derived from the scene box so the orbit frames
        whatever scene is loaded (the real capture's head box or the
        synthetic sphere) instead of hardcoding the head position."""
        box = np.asarray(self.config.model.scene_box, np.float64) \
            / self.config.data.scale_factor
        center = box.mean(axis=0)
        half_diag = float(np.linalg.norm(box[1] - box[0])) / 2.0
        return center, max(0.75 * half_diag, 1e-3)

    def _build_param_shardings(self):
        """Pytree of NamedShardings for the params: everything replicated
        except the hash table, which may be (a) feature-axis sharded
        [E, W/devices] — the TP layout of SURVEY.md section 2c — or (b)
        entry-axis sharded [E/devices, W] — the ZeRO-3 table-gradient
        pipeline (PERF.md trajectory): forward casts the shard to bf16 and
        all-gathers; backward reduce-scatters the folded bf16 gradient so
        fold+Adam state updates touch only the local shard."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        replicated = mesh_lib.replicated(self.mesh)
        pcfg = self.config.parallel
        table_sharding = replicated
        if self.config.model.shard_hash_tables:
            # feature-axis TP: gathers stay shard-local, the blend matmul
            # contracts over the sharded axis (GSPMD inserts the all-reduce)
            table_sharding = NamedSharding(self.mesh, P(None, "data"))
        elif (pcfg.shard_table_params and self.n_devices > 1
              and self.params["field"]["table"].shape[0]
              % self.n_devices == 0):
            table_sharding = NamedSharding(self.mesh, P("data", None))
            self.model.table_replicate_sharding = replicated

        def spec(path, leaf):
            keys = tuple(getattr(k, "key", None) for k in path)
            if keys[:2] == ("field", "table"):
                return table_sharding
            return replicated

        return jax.tree_util.tree_map_with_path(spec, self.params)

    def _moment_shardings(self):
        """Shardings for the Adam moments: same as the params, except the
        hash table's moments are optionally ZeRO-sharded over the mesh's
        data axis even when the PARAM stays replicated (entry-axis shards;
        GSPMD inserts the collectives around the optimizer update). Under
        the full ZeRO-3 layout (shard_table_params) the param sharding
        already IS entry-sharded and the moments simply follow it."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        cfg = self.config.parallel
        E = self.params["field"]["table"].shape[0]
        if self.model.table_replicate_sharding is not None:
            return self.param_shardings  # ZeRO-3: moments follow the shard
        if (not cfg.shard_table_optimizer or self.n_devices == 1
                or self.config.model.shard_hash_tables
                or E % self.n_devices != 0):
            return self.param_shardings
        table_mom = NamedSharding(self.mesh, P("data", None))
        replicated = mesh_lib.replicated(self.mesh)

        def spec(path, leaf):
            keys = tuple(getattr(k, "key", None) for k in path)
            if keys[:2] == ("field", "table"):
                return table_mom
            return replicated

        return jax.tree_util.tree_map_with_path(spec, self.params)

    # ------------------------------------------------------------------
    # compiled functions
    # ------------------------------------------------------------------

    def _build_steps(self):
        model = self.model
        optimizer = self.optimizer
        key_to_group = self.key_to_group
        replicated = mesh_lib.replicated(self.mesh)
        sharded = mesh_lib.batch_sharding(self.mesh)

        base_rng = jax.random.PRNGKey(self.config.seed + 1)

        def train_step(params, opt_state, grid_occs, grid_mask, batch, sched,
                       lrs, step_idx, budget=None):
            binaries = model.binaries(grid_occs, grid_mask)
            # per-step stream derived INSIDE the jit (an eager host-side
            # fold_in/split is a tunnel round trip per step)
            rng = jax.random.split(jax.random.fold_in(base_rng, step_idx))[1]

            def loss_fn(p):
                outputs = model.render_rays(p, batch, binaries, sched,
                                            rng=rng, train=True,
                                            budget=budget)
                losses = model.compute_losses(outputs, batch, sched, train=True)
                total = sum(losses.values())
                aux = {
                    "losses": losses,
                    "psnr": M.psnr(outputs["rgb"], batch["rgb"]),
                    "num_samples": jnp.sum(outputs["num_samples_per_ray"]),
                    "num_dropped": jnp.sum(outputs["num_dropped_per_ray"]),
                    "num_budget_dropped": outputs["num_budget_dropped"],
                }
                return total, aux

            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            params, opt_state = fused_adam_update(params, grads, opt_state,
                                                  key_to_group, lrs)
            return params, opt_state, total, aux

        # one jitted step per (rare, quantized) compaction budget — the
        # adaptive-budget logic re-jits only when the quantum changes
        self._train_step_fn = train_step
        self._train_steps = {}

        def make_step(budget):
            import functools
            return jax.jit(
                functools.partial(train_step, budget=budget),
                donate_argnums=(0, 1),
                # params/opt_state shardings are inferred from the committed
                # arrays (replicated, or table/ZeRO-sharded)
                in_shardings=(None, None, replicated, replicated,
                              sharded, replicated, replicated, replicated),
            )

        self._make_train_step = make_step

        cfg = self.config
        R = cfg.data.train_num_rays_per_batch
        S = cfg.model.sampling.max_samples_per_ray
        frac = cfg.model.sampling.global_budget_fraction
        self._budget = -(-int(R * S * frac) // 128) * 128 \
            if 0 < frac < 1.0 else R * S
        scfg = cfg.model.sampling
        # growth cap: never below the formula budget (the startup step
        # compiles and runs at it, so it provably fits HBM) — the cap only
        # bounds ADAPTIVE growth past it (config.adaptive_budget_max_chunks:
        # the flagship dynamic OOMed at 4 chunks, round 4)
        self._budget_cap = R * S
        if (scfg.adaptive_budget and scfg.adaptive_budget_max_chunks > 0
                and cfg.model.max_n_samples_per_batch > 0):
            self._budget_cap = max(
                self._budget,
                scfg.adaptive_budget_max_chunks * cfg.model.max_n_samples_per_batch)
        if self._loaded_budget is not None:
            # resume with the ADAPTED budget the checkpoint trained with —
            # restarting from the config formula would silently drop samples
            # for up to adaptive_budget_interval steps after every resume
            self._budget = min(int(self._loaded_budget), self._budget_cap)
        self._sample_counts = list(getattr(self, "_loaded_counts", []))
        self._budget_drops = list(getattr(self, "_loaded_drops", []))

        def occ_update(params, grid_occs, step_idx, sched, warmup):
            rng = jax.random.split(
                jax.random.fold_in(base_rng, step_idx))[0]
            return model.occupancy_grid_update(params, grid_occs, rng, sched,
                                               warmup=warmup)

        self._occ_update_warm = jax.jit(lambda p, g, i, s: occ_update(p, g, i, s, True),
                                        donate_argnums=(1,))
        self._occ_update = jax.jit(lambda p, g, i, s: occ_update(p, g, i, s, False),
                                   donate_argnums=(1,))

        def render_chunk(params, fparams, grid_occs, grid_mask, batch, sched,
                         budget=None):
            binaries = model.binaries(grid_occs, grid_mask)
            out = model.render_rays(params, batch, binaries, sched,
                                    rng=None, train=False, budget=budget,
                                    fparams=fparams)
            # ONE packed [R, 8] output array (rgb 3 | depth 1 | acc 1 |
            # deformation 3): each separately-fetched narrow output costs a
            # device relayout + a tunnel round trip — 3 fetches measured
            # 116 ms/chunk vs ~103 ms of render compute; the single packed
            # fetch is ~11 ms (PERF.md render section).
            cols = [out["rgb"], out["depth"], out["accumulation"]]
            cols.append(out.get("deformation",
                                jnp.zeros_like(out["rgb"])))
            kept = {"_packed": jnp.concatenate(cols, axis=1)}
            # num_samples_per_ray is counted BEFORE budget compaction, so it
            # already includes any budget-dropped samples — adding
            # num_budget_dropped on top double-counted them and inflated the
            # auto render budget ~40% on under-carved grids
            kept["_n_valid"] = jnp.sum(out["num_samples_per_ray"])
            kept["_n_budget_dropped"] = out.get("num_budget_dropped",
                                                jnp.int32(0))
            return kept

        def make_render_chunk(budget):
            import functools
            return jax.jit(functools.partial(render_chunk, budget=budget),
                           in_shardings=(None, None, replicated, replicated,
                                         sharded, replicated))

        self._render_chunks = {None: make_render_chunk(None)}
        self._make_render_chunk = make_render_chunk
        # the eval-time quad gather operand: built once per (params, image)
        # instead of once per chunk — ~22 rebuilds per eval image at the
        # default 1024-ray chunk (PERF.md render section)
        from nersemble_tpu.models.field import prepare_field

        model_cfg = self.config.model

        def _prep(params):
            return prepare_field(params["field"], model_cfg, model.levels,
                                 replicate_sharding=model.table_replicate_sharding)

        self._prepare_fparams = jax.jit(_prep)
        self._fparams_cache = None  # (params_object, fparams)
        self._render_chunk = self._render_chunks[None]

        # eval ray packing (see render_image): the expanded occupied-cell
        # AABB, recomputed when the grid state changes, and the per-frame
        # slab test deciding which rays can render anything at all
        from nersemble_tpu.ops.sampling import (
            occupied_world_aabb,
            ray_aabb_intersect,
        )

        def _occ_aabb(grid_occs, grid_mask):
            return occupied_world_aabb(model.binaries(grid_occs, grid_mask),
                                       model.aabb_min, model.aabb_max)

        def _hit_test(origins, directions, lo, hi):
            t_near, t_far = ray_aabb_intersect(origins, directions, lo, hi)
            t_near = jnp.maximum(t_near, model_cfg.near_plane)
            t_far = jnp.minimum(t_far, model_cfg.far_plane)
            return t_near <= t_far

        self._occ_aabb_fn = jax.jit(_occ_aabb)
        self._hit_test_fn = jax.jit(_hit_test)
        self._packing_cache = None  # (grid_occs ref, grid_mask ref, lo, hi, any)

    # ------------------------------------------------------------------
    # schedules (host side)
    # ------------------------------------------------------------------

    def sched_values(self, step: int) -> Dict[str, np.float32]:
        """Plain numpy host scalars: jnp.float32(...) is an EAGER device op
        dispatched per step — through the axon tunnel each one is a
        serialized round trip (measured as ~30 ms/step of constant-fusion
        stall bubbles in the trace). np scalars transfer with the jit call."""
        cfg = self.config.model
        sched = {}
        if cfg.use_deformation_field and cfg.window_deform_end >= 1:
            sched["window_deform"] = np.float32(generic_schedule(
                step, 0.0, cfg.deformation_field.n_freq_pos,
                cfg.window_deform_begin, cfg.window_deform_end))
        if cfg.use_hash_ensemble and cfg.window_hash_encodings_end > 0:
            sched["window_hash"] = np.float32(generic_schedule(
                step, 1.0, cfg.hash_ensemble.n_hash_encodings,
                cfg.window_hash_encodings_begin, cfg.window_hash_encodings_end))
        if cfg.lambda_empty_loss > 0 or cfg.lambda_near_loss > 0:
            sched["eps_depth"] = np.float32(generic_schedule(
                step, cfg.eps_depth_initial, cfg.eps_depth_final,
                cfg.eps_depth_begin_step, cfg.eps_depth_end_step))
        return sched

    def lr_values(self, step: int) -> Dict[str, np.float32]:
        return {name: np.float32(step_lr(step, oc.lr, oc.scheduler_step_size,
                                          oc.scheduler_gamma))
                for name, oc in self.config.optimizers.items()}

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def _device_batch(self, host_batch: Dict[str, np.ndarray]) -> Dict:
        keys = ("origins", "directions", "rgb", "timesteps", "camera_indices",
                "alpha", "depth")
        batch = {k: host_batch[k] for k in keys if k in host_batch}
        return mesh_lib.shard_batch(batch, self.mesh)

    def apply_grid_mask(self, mask) -> None:
        """AND an extra [G, G, G] bool mask (e.g. the eval-time largest-
        connected-component filter) into the sampling binaries."""
        self.grid_mask = self.grid_mask & jnp.asarray(mask)
        # a budget probed on the old binaries is stale (the mask changes the
        # per-chunk sample fill) — re-probe on the next auto-budget render
        self._auto_render_budget = None

    def _maybe_adapt_budget(self, step: int, aux) -> None:
        """Re-size the compaction budget to the measured valid-sample count
        (quantized + hysteresis, see ops/sampling.quantized_budget). Sample
        counts are only fetched on the cheap cadence of the adaptive
        interval so the dispatch pipeline never blocks on extra syncs."""
        scfg = self.config.model.sampling
        if not scfg.adaptive_budget:
            return
        interval = max(scfg.adaptive_budget_interval, 1)
        # sample the diagnostics a few times per interval; densely (every 25
        # steps) through the first two intervals so the fast-grow path below
        # reacts within ~25 steps of launch/resume instead of interval//4
        # (each sample is one scalar fetch — ~30 ms through the tunnel,
        # amortized to ~0.1% of the step at the dense cadence)
        cadence = max(interval // 4, 1)
        if step < 2 * interval:
            cadence = min(cadence, 25)
        if step % cadence != 0:
            return
        self._sample_counts.append(float(aux["num_samples"]))
        self._budget_drops.append(float(aux["num_budget_dropped"]))
        del self._sample_counts[:-16], self._budget_drops[:-16]
        # grow IMMEDIATELY when the sampled step dropped >2% of its valid
        # samples — waiting for the interval boundary starved the early
        # dynamic fade-in of ~40% of its samples for 500 straight steps
        # (round-4 NERS-005..010 logged ~100k budget-dropped of 235k at
        # every step through the first interval). Shrinks still wait for
        # the boundary (hysteresis in quantized_budget). Step-indexed, so
        # resumed runs make identical growth decisions.
        drop_frac = self._budget_drops[-1] / max(self._sample_counts[-1], 1.0)
        if step == 0 or (step % interval != 0 and drop_frac <= 0.02):
            return
        from nersemble_tpu.ops.sampling import quantized_budget
        R = self.config.data.train_num_rays_per_batch
        S = self.config.model.sampling.max_samples_per_ray
        # num_samples is the PRE-compaction valid count (march diagnostics),
        # so it already includes anything the current budget dropped
        measured = max(self._sample_counts[-8:])
        new = quantized_budget(measured, R, S,
                               headroom=scfg.adaptive_budget_headroom,
                               current=self._budget)
        new = min(new, self._budget_cap)
        if new != self._budget:
            print(f"[nersemble-tpu] step {step}: compaction budget "
                  f"{self._budget} -> {new} "
                  f"(measured {measured:.0f} valid samples/batch)")
            self.writer.put_scalars(step, {"sample_budget": new})
            self._budget = new

    def maybe_update_occupancy(self, step: int, step_idx) -> None:
        cfg = self.config.model
        if cfg.disable_occupancy_grid or step % OCC_UPDATE_EVERY != 0:
            return
        sched = self.sched_values(step)
        if step < cfg.occupancy_grid_warmup_steps:
            self.grid_occs = self._occ_update_warm(self.params, self.grid_occs,
                                                   step_idx, sched)
        else:
            self.grid_occs = self._occ_update(self.params, self.grid_occs,
                                              step_idx, sched)

    def save_dataparser_transforms(self) -> None:
        """Artifact parity with nerfstudio's dataparser_transforms.json
        (reference: nersemble_trainer.py:29-31): records the world transform
        applied by the dataparser so model outputs are relocatable."""
        import json
        path = self.run_dir / "dataparser_transforms.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps({
            "transform": np.eye(4)[:3].tolist(),
            "scale": float(self.config.data.scale_factor),
        }, indent=2))

    def train(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.config
        max_steps = max_steps or cfg.max_num_iterations
        self.save_dataparser_transforms()
        # batches are step-indexed (pure in (seed, step)): resume consumes
        # bit-identical batches to the uninterrupted run (ray_batcher.py)
        batch_iter = self.batcher.iter_from(self.start_step)
        n_rays = cfg.data.train_num_rays_per_batch

        # optional jax profiler trace (aux-subsystem parity with the
        # reference's nerfstudio profiler, SURVEY.md section 5): set
        # NERSEMBLE_PROFILE_DIR to capture steps 10-14 of this run
        import os
        profile_dir = os.environ.get("NERSEMBLE_PROFILE_DIR")

        last = {}
        t_last_log = time.time()
        rays_since_log = 0
        for step in range(self.start_step, max_steps):
            if profile_dir and step == self.start_step + 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and step == self.start_step + 15:
                jax.profiler.stop_trace()
            step_idx = np.int32(step)
            self.maybe_update_occupancy(step, step_idx)

            host_batch = next(batch_iter)
            batch = self._device_batch(host_batch)
            sched = self.sched_values(step)
            lrs = self.lr_values(step)
            if self._budget not in self._train_steps:
                self._train_steps[self._budget] = \
                    self._make_train_step(self._budget)
            self.params, self.opt_state, total, aux = \
                self._train_steps[self._budget](
                    self.params, self.opt_state, self.grid_occs,
                    self.grid_mask, batch, sched, lrs, step_idx)
            rays_since_log += n_rays
            self._maybe_adapt_budget(step, aux)
            self._service_viewer(step)

            if step % cfg.steps_per_log == 0 or step == max_steps - 1:
                total = float(total)
                losses = {k: float(v) for k, v in aux["losses"].items()}
                now = time.time()
                dt = max(now - t_last_log, 1e-6)
                from nersemble_tpu.engine.writer import device_memory_scalars
                scalars = {
                    "train_loss": total,
                    "train_psnr": float(aux["psnr"]),
                    "rays_per_sec": rays_since_log / dt,
                    "samples_per_batch": float(aux["num_samples"]),
                    "dropped_samples_per_batch": float(aux["num_dropped"]),
                    **{f"loss/{k}": v for k, v in losses.items()},
                    **{f"lr/{k}": float(v) for k, v in lrs.items()},
                    **{f"window_param/{k}": float(v) for k, v in sched.items()},
                    **device_memory_scalars(),
                }
                if "num_budget_dropped" in aux:
                    scalars["budget_dropped_per_batch"] = \
                        float(aux["num_budget_dropped"])
                self.writer.put_scalars(step, scalars)
                t_last_log = now
                rays_since_log = 0
                last = {"step": step, "loss": total, **scalars}

            if cfg.steps_per_eval_batch and step > 0 \
                    and step % cfg.steps_per_eval_batch == 0:
                self._eval_batch(step)

            if cfg.steps_per_eval_image and step > 0 \
                    and step % cfg.steps_per_eval_image == 0:
                self._eval_image(step, image_idx=step // cfg.steps_per_eval_image
                                 % max(len(self.eval_loader), 1))
                self._train_image(step)

            if cfg.steps_per_eval_all_images and step > 0 \
                    and step % cfg.steps_per_eval_all_images == 0:
                self._eval_all_images(step)

            if cfg.steps_per_save and step > 0 and step % cfg.steps_per_save == 0:
                self.save_checkpoint(step)

            # release eval-render caches before the next train step: the
            # prepared quad gather operand (fparams, ~3.3 GB bf16 at flagship
            # ensemble size) cached by render_image is STALE once params are
            # donated, and retaining it OOMed every round-4 flagship dynamic
            # run on the first step after its first _eval_all_images
            # (RESOURCE_EXHAUSTED at the next batch device_put)
            self._fparams_cache = None

        final_step = max_steps - 1
        self.save_checkpoint(final_step)
        return last

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    def _eval_batch(self, step: int) -> None:
        """Eval-ray loss batch (reference: nersemble_trainer.py:120-125).
        One persistent (threadless) batch generator is reused across calls."""
        if self._eval_batch_iter is None:
            eval_batcher = RayBatcher(
                self.eval_dataset, self.config.data,
                num_rays=self.config.data.eval_num_rays_per_batch
                // self.n_devices * self.n_devices,
                seed=self.config.seed + 7919)
            self._eval_batch_iter = eval_batcher._generator()
        host_batch = next(self._eval_batch_iter)
        batch = self._device_batch(host_batch)
        sched = self.sched_values(step)
        out = self._render_chunk(self.params, None, self.grid_occs,
                                 self.grid_mask,
                                 {k: batch[k] for k in
                                  ("origins", "directions", "timesteps",
                                   "camera_indices")}, sched)
        rgb = out["_packed"][:, 0:3]
        scalars = {
            "eval_psnr": float(M.psnr(rgb, batch["rgb"])),
            "eval_mse": float(M.mse(rgb, batch["rgb"])),
        }
        self.writer.put_scalars(step, scalars)

    def render_image(self, image_rays: Dict, step: int,
                     chunk: Optional[int] = None,
                     budget=None) -> Dict[str, np.ndarray]:
        """Full-image chunked render through the compiled render fn.

        ``budget="auto"``: probe the first chunk un-budgeted, read the real
        valid-sample fill, and compile a right-sized compaction budget for
        every following chunk. The default eval budget (R * S * fraction) is
        fill-oblivious and evaluated ~23x more samples than the rays
        contained on the measured scene (PERF.md render section).

        Budget overflow is never silent: any budgeted chunk that reports
        ``num_budget_dropped > 0`` (probe biased low, denser view/timestep,
        budget cached before a grid-mask or checkpoint change) is re-rendered
        un-budgeted at the end, and the cached budget grows to cover it.

        Ray packing (``sampling.eval_ray_packing``): rays that provably miss
        every occupied grid cell (slab test vs the expanded occupied-cell
        AABB — ops/sampling.occupied_world_aabb) are skipped entirely and
        composited as exact background; only the hits flow through the chunk
        loop. Output-identical to rendering every ray."""
        chunk = chunk or self.config.data.eval_num_rays_per_batch
        chunk = mesh_lib.pad_to_multiple(chunk, self.n_devices)
        H, W = image_rays["height"], image_rays["width"]
        n = H * W
        ray_keys = ("origins", "directions", "timesteps", "camera_indices")
        ray_arrays = {key: image_rays[key] for key in ray_keys}
        pack_idx = None
        if (self.config.model.sampling.eval_ray_packing
                and not self.config.model.disable_occupancy_grid):
            hit = self._render_hit_mask(image_rays)
            pack_idx = np.nonzero(hit)[0]
            ray_arrays = {key: arr[pack_idx]
                          for key, arr in ray_arrays.items()}
        n_render = n if pack_idx is None else int(pack_idx.size)
        sched = self.sched_values(step)
        scfg = self.config.model.sampling
        S = scfg.max_samples_per_ray
        if scfg.eval_max_samples_per_ray > 0:
            S = min(S, scfg.eval_max_samples_per_ray)
        # quad gather operand: built once per params object, reused across
        # this image's chunks (the cache holds a ref, so id() stays valid)
        if self._fparams_cache is None \
                or self._fparams_cache[0] is not self.params:
            self._fparams_cache = (self.params,
                                   self._prepare_fparams(self.params))
        fparams = self._fparams_cache[1]

        def quantize(fill: float) -> int:
            b = int(fill * 1.5)
            return min(max(-(-b // 8192) * 8192, 8192), chunk * S)

        results = []  # [lo, hi, out, used_budget, device_batch]
        for lo in range(0, n_render, chunk):
            hi = min(lo + chunk, n_render)
            pad = chunk - (hi - lo)
            sl = {}
            for key in ray_keys:
                arr = ray_arrays[key][lo:hi]
                if pad:
                    arr = np.concatenate([arr, np.repeat(arr[-1:], pad, 0)])
                sl[key] = arr
            batch = mesh_lib.shard_batch(sl, self.mesh)
            use_budget = None
            if budget == "auto":
                probe = self._auto_render_budget
                if probe is None and lo == 0:
                    pass  # probe chunk: run un-budgeted, measure below
                else:
                    use_budget = probe
            elif budget is not None:
                use_budget = int(budget)
            if use_budget is not None and use_budget not in self._render_chunks:
                self._render_chunks[use_budget] = \
                    self._make_render_chunk(use_budget)
            out = self._render_chunks[use_budget](self.params, fparams,
                                                  self.grid_occs,
                                                  self.grid_mask, batch, sched)
            if budget == "auto" and self._auto_render_budget is None:
                self._auto_render_budget = quantize(float(out["_n_valid"]))
            # keep DEVICE arrays here: a per-chunk np.asarray would block the
            # dispatch pipeline on every chunk's transfer
            results.append([lo, hi, out, use_budget, batch])

        if budget == "auto":
            # overflow safety net (the scalar fetch syncs only after every
            # chunk has been dispatched, so the pipeline stays full)
            for rec in results:
                if rec[3] is None or float(rec[2]["_n_budget_dropped"]) <= 0:
                    continue
                rec[2] = self._render_chunks[None](
                    self.params, fparams, self.grid_occs, self.grid_mask,
                    rec[4], sched)
                self._auto_render_budget = max(
                    self._auto_render_budget or 0,
                    quantize(float(rec[2]["_n_valid"])))

        # ONE host transfer per chunk (see render_chunk's packed layout)
        parts = [np.asarray(out["_packed"])[:hi - lo]
                 for lo, hi, out, _, _ in results]
        if pack_idx is None:
            packed = np.concatenate(parts)
        else:
            # skipped rays composite exact background: zero weights =>
            # rgb = background, depth/accumulation/deformation = 0
            # (ops/rendering.render_rgb with acc == 0)
            packed = np.zeros((n, 8), np.float32)
            packed[:, 0:3] = np.asarray(self.model.background)
            if parts:
                packed[pack_idx] = np.concatenate(parts)
        image = {"rgb": packed[:, 0:3], "depth": packed[:, 3:4],
                 "accumulation": packed[:, 4:5]}
        if self.config.model.use_deformation_field:
            image["deformation"] = packed[:, 5:8]
        return {key: val.reshape(H, W, -1) for key, val in image.items()}

    def _render_hit_mask(self, image_rays: Dict) -> np.ndarray:
        """bool [n]: which of the frame's rays can possibly hit an occupied
        cell (slab test against the expanded occupied-cell AABB). The AABB
        is recomputed only when the grid state changes (identity-keyed, like
        ``_fparams_cache`` — the cache holds the refs)."""
        cache = self._packing_cache
        if (cache is None or cache[0] is not self.grid_occs
                or cache[1] is not self.grid_mask):
            lo, hi, any_occ = self._occ_aabb_fn(self.grid_occs, self.grid_mask)
            cache = (self.grid_occs, self.grid_mask,
                     np.asarray(lo), np.asarray(hi), bool(any_occ))
            self._packing_cache = cache
        _, _, lo, hi, any_occ = cache
        n = image_rays["origins"].shape[0]
        if not any_occ:
            return np.zeros(n, bool)
        hits = self._hit_test_fn(jnp.asarray(image_rays["origins"]),
                                 jnp.asarray(image_rays["directions"]),
                                 jnp.asarray(lo), jnp.asarray(hi))
        return np.asarray(hits)

    def _eval_image(self, step: int, image_idx: int = 0) -> Dict[str, float]:
        image_rays = self.eval_loader.image_rays(image_idx)
        rendered = self.render_image(image_rays, step)
        gt = image_rays["gt_rgb"]
        # full metric bundle incl. masked variants + LPIPS-when-weighted —
        # parity with the reference's periodic get_image_metrics_and_images
        # (nersemble_instant_ngp.py:424-500), which logs masked PSNR/SSIM/
        # LPIPS/MSE at every eval cadence, not only in the eval CLI
        regular, masked = M.image_metrics(rendered["rgb"], gt,
                                          image_rays.get("gt_alpha"))
        scalars = {
            "eval_image_psnr": regular["psnr"],
            "eval_image_ssim": regular["ssim"],
            "eval_image_mse": regular["mse"],
        }
        if regular["lpips"] is not None:
            scalars["eval_image_lpips"] = regular["lpips"]
        for key in ("psnr", "ssim", "mse", "lpips"):
            if masked.get(key) is not None:
                scalars[f"eval_image_{key}_masked"] = masked[key]
        self.writer.put_scalars(step, scalars)
        cam = image_rays["entry"].cam_id
        self.writer.put_image(step, f"cam_{cam}_rgb", rendered["rgb"])
        self.writer.put_image(step, f"cam_{cam}_gt", gt)
        # colormapped diagnostics (reference get_image_metrics_and_images,
        # nersemble_instant_ngp.py:424-500: acc / depth / error / deformation)
        from nersemble_tpu.utils import colormaps as C
        self.writer.put_image(step, f"cam_{cam}_accumulation",
                              C.apply_colormap(rendered["accumulation"]))
        self.writer.put_image(step, f"cam_{cam}_depth",
                              C.apply_depth_colormap(
                                  rendered["depth"],
                                  accumulation=rendered["accumulation"]))
        self.writer.put_image(step, f"cam_{cam}_error",
                              C.apply_error_colormap(rendered["rgb"], gt))
        if "deformation" in rendered:
            self.writer.put_image(step, f"cam_{cam}_deformation",
                                  C.apply_scene_flow_colormap(
                                      rendered["deformation"]))
        return scalars

    def _train_image(self, step: int) -> None:
        """Render one training view for logging
        (reference: nersemble_trainer.py:144-162)."""
        if not hasattr(self, "_train_image_loader"):
            self._train_image_loader = EvalImageLoader(self.train_dataset)
        loader = self._train_image_loader
        image_idx = step % max(len(loader), 1)
        image_rays = loader.image_rays(image_idx)
        rendered = self.render_image(image_rays, step)
        self.writer.put_image(step, f"idx_{image_idx}_rgb", rendered["rgb"],
                              group="train_images")
        self.writer.put_image(step, f"idx_{image_idx}_gt", image_rays["gt_rgb"],
                              group="train_images")
        self.writer.put_scalars(step, {
            "train_image_psnr": float(M.psnr(jnp.asarray(rendered["rgb"]),
                                             jnp.asarray(image_rays["gt_rgb"])))})

    def viewer_render(self, params: Dict, step: int) -> np.ndarray:
        """Render one live-viewer frame (orbit camera params from the web
        UI) through the normal render path. Runs on the trainer thread —
        see viewer/server.py for the threading model."""
        from nersemble_tpu.data.cameras import generate_image_rays
        from nersemble_tpu.utils import colormaps as C
        from nersemble_tpu.viewer import orbit_pose

        if not hasattr(self, "_viewer_intr"):
            self._viewer_intr = self.dataparser.data_manager \
                .load_camera_params().intrinsics
        cfg = self.config
        scale = cfg.data.scale_factor
        out = self.train_outputs
        orig_w = out.image_width * cfg.data.downscale_factor
        orig_h = out.image_height * cfg.data.downscale_factor
        width = int(params["width"])
        height = max(16, round(width * orig_h / orig_w))
        intr = self._viewer_intr.rescale(width / orig_w)
        # same OpenCV -> OpenGL/world-scale pose chain as the render CLI,
        # orbiting the scene-box center (viewer_defaults)
        center, _ = self.viewer_defaults()
        pose = orbit_pose(params["az"], params["el"], params["dist"],
                          center=center)
        p = pose @ np.diag([1.0, -1.0, -1.0, 1.0])
        p[:3, 3] *= scale
        origins, dirs = generate_image_rays(p, intr, height, width)
        n_t = cfg.data.n_timesteps
        t_idx = int(round(float(params["t"]) * max(n_t - 1, 0)))
        image_rays = {
            "origins": origins, "directions": dirs,
            "timesteps": np.full(origins.shape[0], t_idx, np.int32),
            "camera_indices": np.zeros(origins.shape[0], np.int32),
            "height": height, "width": width,
        }
        rendered = self.render_image(image_rays, step=step, budget="auto")
        channel = params.get("channel", "rgb")
        if channel == "depth":
            return C.apply_depth_colormap(
                rendered["depth"], accumulation=rendered["accumulation"],
                near=0.8 * scale, far=1.2 * scale)
        if channel == "deformation" and "deformation" in rendered:
            return C.apply_scene_flow_colormap(rendered["deformation"])
        return rendered["rgb"]

    def _service_viewer(self, step: int) -> None:
        if self.viewer is None:
            return
        self.viewer.update_state(step=step)
        while self.viewer.service(lambda p: self.viewer_render(p, step)):
            pass

    def _eval_all_images(self, step: int) -> None:
        """Average metrics over every eval view
        (reference: nersemble_trainer.py:164-167), plus per-camera and
        per-timestep PSNR means — a hold-out regression must be attributable
        (one ghosted camera? late-timestep drift?) without rerunning."""
        psnrs, ssims = [], []
        masked_acc = {"psnr": [], "ssim": [], "mse": [], "lpips": []}
        by_cam, by_t = {}, {}
        for image_idx in range(len(self.eval_loader)):
            image_rays = self.eval_loader.image_rays(image_idx)
            rendered = self.render_image(image_rays, step)
            regular, masked = M.image_metrics(rendered["rgb"],
                                              image_rays["gt_rgb"],
                                              image_rays.get("gt_alpha"))
            p = regular["psnr"]
            psnrs.append(p)
            ssims.append(regular["ssim"])
            for key, vals in masked_acc.items():
                if masked.get(key) is not None:
                    vals.append(masked[key])
            entry = image_rays["entry"]
            by_cam.setdefault(entry.cam_id, []).append(p)
            by_t.setdefault(entry.timestep_index, []).append(p)
        scalars = {
            "eval_all_psnr": float(np.mean(psnrs)),
            "eval_all_ssim": float(np.mean(ssims)),
        }
        for key, vals in masked_acc.items():
            if vals:
                scalars[f"eval_all_{key}_masked"] = float(np.mean(vals))
        for cam, vals in sorted(by_cam.items()):
            scalars[f"eval_cam{cam}_psnr"] = float(np.mean(vals))
        if len(by_t) > 1:
            for t, vals in sorted(by_t.items()):
                scalars[f"eval_t{t}_psnr"] = float(np.mean(vals))
        self.writer.put_scalars(step, scalars)

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def checkpoint_dir(self) -> Path:
        if self.model_manager:
            return Path(self.model_manager.get_checkpoint_folder())
        return self.run_dir / "checkpoints"

    def save_checkpoint(self, step: int) -> None:
        path = self.checkpoint_dir() / f"step-{step:09d}.ckpt"
        # the adapted compaction budget AND its measurement window are
        # training state: resume must make the same adaptation decisions at
        # the same steps as the uninterrupted run (trajectory exactness)
        extra = {"sample_budget": np.asarray(getattr(self, "_budget", 0)),
                 "sample_counts": np.asarray(self._sample_counts[-16:],
                                             np.float64),
                 "budget_drops": np.asarray(self._budget_drops[-16:],
                                            np.float64)}
        t0 = time.time()
        checkpoints.save_checkpoint(path, step, self.params, self.opt_state,
                                    self.grid_occs, extra=extra)
        dt = time.time() - t0
        if dt > 5.0:  # flagship saves cross the tunnel (minutes) — make the
            # cost visible so cadence choices stay evidence-based
            print(f"[nersemble-tpu] step {step}: checkpoint saved in {dt:.0f} s")
        self.writer.put_scalars(step, {"checkpoint_save_seconds": dt})
        if self.config.save_only_latest_checkpoint:
            checkpoints.prune_old_checkpoints(self.checkpoint_dir(), step)

    def _load_checkpoint(self) -> None:
        load_dir = Path(self.config.load_dir)
        if self.config.load_step is not None:
            path = load_dir / f"step-{self.config.load_step:09d}.ckpt"
        else:
            steps = sorted(int(p.stem.split("-")[1])
                           for p in load_dir.glob("step-*.ckpt"))
            if not steps:
                raise FileNotFoundError(f"No checkpoints in {load_dir}")
            path = load_dir / f"step-{steps[-1]:09d}.ckpt"
        step, params, opt_state, grid_occs, extra = checkpoints.load_checkpoint(
            path, self.params, self.opt_state, self.grid_occs,
            load_opt=not self._eval_only)
        self.params = jax.device_put(params, self.param_shardings)
        if not self._eval_only:
            self.opt_state = jax.device_put(opt_state, self.opt_shardings)
        self.grid_occs = jnp.asarray(grid_occs)
        self.start_step = step + 1
        if int(extra.get("sample_budget", 0)) > 0:
            self._loaded_budget = int(extra["sample_budget"])
        self._loaded_counts = (
            list(np.asarray(extra["sample_counts"], np.float64))
            if "sample_counts" in extra else [])
        self._loaded_drops = (
            list(np.asarray(extra["budget_drops"], np.float64))
            if "budget_drops" in extra else [])
        self._auto_render_budget = None
