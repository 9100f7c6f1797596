"""Staged diffusion pipelines: prepare -> denoising step -> postprocess.

Rebuilds the reference pipeline contract (prepare_inference / denoising_step /
post_inference, e.g. sduss/model_executor/diffusers/pipelines/stable_diffusion/
pipeline_stable_diffusion_esymred.py:51,206,307) as host-side orchestration of
pre-compiled jitted stage functions:

* ``prepare``    — tokenize (host) + text-encode (jit, bucketed batch) +
                   per-request latent init + sampler table creation.
* ``denoise_step`` — ONE scheduled denoiser step for a batch of requests
                   grouped by resolution; CFG pairing, input scaling, model
                   forward and sampler update fused into a single jitted call
                   per (resolution, batch-bucket).
* ``postprocess``  — VAE decode (jit, per resolution) to uint8 images.

Batch shapes are padded to configured buckets so the XLA compile cache stays
bounded (reference recompilation concern; SURVEY.md section 7 hard part 3).
Every stage function is pure; requests at different timesteps batch via the
sampler coefficient rows (sduss_tpu/samplers/base.py).
"""

from __future__ import annotations

import threading
import time as _time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sduss_tpu.config import Config, bucket_for
from sduss_tpu.logger import init_logger
from sduss_tpu.models.registry import ModelBundle
from sduss_tpu.request import Request
from sduss_tpu.samplers import gather_coeffs, gather_timesteps, get_sampler

logger = init_logger(__name__)


def _pad_batch(arr: np.ndarray, target: int) -> np.ndarray:
    """Pad the leading axis to ``target`` by repeating the last row."""
    b = arr.shape[0]
    if b == target:
        return arr
    reps = np.repeat(arr[-1:], target - b, axis=0)
    return np.concatenate([arr, reps], axis=0)


def _latent_drift(new, ref):
    """Relative MSE of the current latent vs the last-full-pass latent
    (the adaptive deep-refresh trigger, CacheConfig.deep_adaptive)."""
    d = (new - ref).astype(jnp.float32)
    return jnp.mean(d * d) / (jnp.mean(ref.astype(jnp.float32) ** 2) + 1e-12)


def _state_nbytes(state) -> int:
    """Device bytes held by a composition-state pytree (shape math only —
    no transfer)."""
    import jax

    return sum(getattr(leaf, "nbytes", 0)
               for leaf in jax.tree.leaves(state))


class BasePipeline:
    """Family-agnostic staged pipeline over a ModelBundle."""

    def __init__(self, bundle: ModelBundle, config: Config, device=None):
        from sduss_tpu.parallel.replica import ReplicaPlacement

        self.bundle = bundle
        self.config = config
        self.spec = bundle.spec
        # `device` is a jax Device, a ReplicaPlacement (sp x tp sub-mesh),
        # or None (default device).
        if device is not None and not isinstance(device, ReplicaPlacement):
            self.placement = ReplicaPlacement([device])
        else:
            self.placement = device
        self.device = getattr(self.placement, "device", None)
        if config.model.sampler:
            self.sampler = get_sampler(config.model.sampler)
        else:
            self.sampler = get_sampler(self.spec.default_sampler,
                                       **self.spec.sampler_kwargs)
        self.vae_scale = self.spec.vae_scale
        self._params_device: Optional[dict] = None
        # jit caches are keyed by (name, *static shape info)
        self._fns: Dict[Any, Callable] = {}
        # Background prepare (engine/worker.py) mints encoder jit keys from
        # a second thread; minting must be atomic per key.
        self._jit_lock = threading.Lock()
        # keys whose program has EXECUTED at least once (jit compiles at
        # first call, not at _jit() time) — drives mixed warm-key routing
        self._executed_keys: set = set()
        self._mixed_warm_pending: set = set()
        self._mixed_warm_lock = threading.Lock()
        self._mixed_warm_thread: Optional[threading.Thread] = None

    # -- device placement ----------------------------------------------------

    # Text-encoder roles kept host-side under ModelConfig.encoders_on_host
    # (stage-wise residency; see config.py).
    ENCODER_ROLES = ("text_encoder", "text_encoder_2", "text_encoder_3")

    @property
    def params(self) -> dict:
        """Device-resident params for the denoise/decode stages.

        With ``encoders_on_host`` the text-encoder subtrees are EXCLUDED
        (they would otherwise ride every jitted stage call onto the chip);
        encode paths use :meth:`encoder_params` instead.
        """
        if self._params_device is None:
            p = self.bundle.params
            if self.config.model.encoders_on_host:
                p = {k: v for k, v in p.items() if k not in self.ENCODER_ROLES}
            if self.placement is not None:
                p = self.placement.put_params(p, self.bundle.denoiser_key)
            self._params_device = p
        return self._params_device

    def encoder_params(self, role: str) -> dict:
        """{role: params} for a text encoder, on chip or host per config."""
        if not self.config.model.encoders_on_host:
            return self.params
        if not hasattr(self, "_host_encoder_params"):
            self._host_encoder_params = {}
        if role not in self._host_encoder_params:
            host = jax.devices("cpu")[0]
            self._host_encoder_params[role] = {
                role: jax.device_put(self.bundle.params[role], host)}
        return self._host_encoder_params[role]

    def _production_stamp(self) -> None:
        """Record a production denoise dispatch (monotonic seconds).

        The mixed warm DAEMON defers to this: its throwaway full-size
        steps execute on the SAME device/host as production, and an
        unthrottled warm drive at load collapses serving (measured, r5b
        mixed qps-1.1: machine SLO 0.0 while the daemon warmed an
        out-of-prewarm-cap composition mid-pass).  Calls from the warm
        thread itself don't count as production."""
        if threading.current_thread().name != "mixed-key-warm":
            self._last_production = _time.monotonic()

    def _warm_wait_idle(self, idle_s: float = 1.0) -> None:
        """Block the warm daemon until production has been idle.

        Unbounded by design: under sustained load the composition keeps
        serving DENSE (the routing fallback) rather than letting warm
        work contend for the device — warm completion is strictly lower
        priority than serving.  No-op off the daemon thread (direct
        _warm_composition calls from tests/prewarm stamp production with
        their own steps and must not self-throttle)."""
        if threading.current_thread().name != "mixed-key-warm":
            return
        while (_time.monotonic() - getattr(self, "_last_production", 0.0)
               < idle_s):
            _time.sleep(0.2)

    def _jit(self, name: str, fn: Callable,
             donate: Sequence[int] = ()) -> Callable:
        if name not in self._fns:
            with self._jit_lock:
                if name not in self._fns:
                    # Computation follows the arguments' device (params are
                    # placed on this pipeline's replica device), so no
                    # explicit device pinning.  ``donate``: argnums whose
                    # buffers XLA may alias into same-shaped outputs —
                    # threaded cache state is multi-GB at b8 1024^2 (the
                    # hybrid row state alone is ~4 GB = 16 CFG rows x
                    # ~252 MB), and holding old+new copies across the step
                    # OOMed the r2v serving prewarm on a 16 GB chip.
                    jitted = jax.jit(fn, donate_argnums=tuple(donate))

                    def timed_first_call(*a, _jitted=jitted, _key=name,
                                         **kw):
                        # Identify cold-compile stalls mid-serving by KEY:
                        # the r3p SD1.5 bdy1 pass hid a 64.8 s stall whose
                        # responsible program was undiagnosable from the
                        # schedule log alone.  Only the first call is
                        # timed; afterwards the raw jitted fn replaces
                        # this shim in _fns (zero steady-state overhead).
                        import time as _t
                        t0 = _t.perf_counter()
                        out = _jitted(*a, **kw)
                        dt = _t.perf_counter() - t0
                        if dt > 5.0:
                            logger.warning(
                                "first call of jit key %r took %.1f s "
                                "(cold compile/executable load reached "
                                "the serving path)", _key, dt)
                        self._fns[_key] = _jitted
                        return out

                    self._fns[name] = timed_first_call
        return self._fns[name]

    # -- family hooks --------------------------------------------------------

    def encode_conditioning(self, prompts: List[str], negatives: List[str],
                            resolutions: List[int]) -> List[Dict[str, np.ndarray]]:
        """Run text encoders; return one conditioning dict per request."""
        raise NotImplementedError

    def denoiser_forward(self, params, latents_in, t, cond, ctx=None,
                         cache=None, cache_state=None):
        """Model forward on a CFG-paired batch.

        Dense: latents_in (2B,h,w,C), cond arrays (B,...) CFG-concatenated by
        the implementation.  Patched: latents_in is the doubled patch batch,
        t/cond are per-image (already CFG-doubled), ctx is a PatchContext.
        With cache/cache_state (block cache), returns (out, new_cache_state).
        """
        raise NotImplementedError

    # -- stage 1: prepare ----------------------------------------------------

    def prepare(self, requests: Sequence[Request]) -> None:
        prompts = [r.params.prompt for r in requests]
        negatives = [r.params.negative_prompt for r in requests]
        resolutions = [r.resolution for r in requests]
        conds = self.encode_conditioning(prompts, negatives, resolutions)

        for req, cond in zip(requests, conds):
            req.conditioning = cond
            req.sampler_table = self.sampler.make_table(req.params.num_inference_steps)
            # Stateful samplers may use more model evals than user steps
            # (PNDM runs num_steps + 1, samplers/pndm.py).
            req.remain_steps = req.sampler_table.num_steps
            h = req.latent_hw(self.vae_scale)
            seed = req.params.seed if req.params.seed is not None else abs(hash(req.request_id)) % (2**31)
            noise = np.random.default_rng(seed).standard_normal(
                (1, h, h, self.bundle.latent_channels), dtype=np.float32)
            lat = noise * req.sampler_table.init_noise_sigma
            req.latents = jnp.asarray(lat, self._latent_dtype())
            if self.placement is not None:
                req.latents = self.placement.put_latents(req.latents)

    def _latent_dtype(self):
        if self.config.model.dtype == "bfloat16":
            return jnp.bfloat16
        return jnp.float32

    # -- stage 2: one denoising step ----------------------------------------

    def denoise_step(self, reqs_by_res: Dict[int, List[Request]],
                     allow_cold: bool = True) -> None:
        """Run ONE denoiser step for every request in the groups (dense path:
        one jitted call per resolution group).

        ``allow_cold`` is accepted for signature parity with
        denoise_step_mixed (the Worker passes False everywhere): dense keys
        are the finite (res x bucket) set uniform prewarm always covers, so
        the dense path itself never routes — but subclasses that REDIRECT
        uniform batches onto a combinatorial-key path (SD3's token path)
        propagate it."""
        del allow_cold
        self._production_stamp()
        for res in sorted(reqs_by_res):
            reqs = reqs_by_res[res]
            if not reqs:
                continue
            self._denoise_group(res, reqs)

    def _denoise_group(self, res: int, reqs: List[Request]) -> None:
        b = len(reqs)
        bb = bucket_for(b, self.config.scheduler.batch_buckets)
        tables = [r.sampler_table for r in reqs]

        latents = jnp.concatenate([r.latents for r in reqs], axis=0)
        if bb != b:
            latents = jnp.concatenate(
                [latents, jnp.repeat(latents[-1:], bb - b, axis=0)], axis=0)
        t = _pad_batch(gather_timesteps(tables), bb)
        coeffs = _pad_batch(gather_coeffs(tables), bb)
        guidance = _pad_batch(np.asarray(
            [r.params.guidance_scale if r.params.guidance_scale is not None
             else self.spec.default_guidance for r in reqs], np.float32), bb)

        cond = self._stack_cond([r.conditioning for r in reqs], bb)

        if self.sampler.needs_state and self._displaced_requested():
            # Stateful samplers (PNDM) keep per-request model-output history;
            # threading it through shard_map alongside KV state is untested —
            # fall back to the exact GSPMD path (sharding still applies).
            self._warn_once("displaced sp_mode: stateful sampler — serving "
                            "on the exact GSPMD path instead")
        if self.sampler.needs_state:
            for req in reqs:
                if req.sampler_state is None:
                    req.sampler_state = self.sampler.init_state(req.latents)
            states = [r.sampler_state for r in reqs]
            if bb != b:
                states = states + [states[-1]] * (bb - b)
            state = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *states)
            fn = self._jit(("denoise_stateful", res, bb), self._denoise_fn_stateful)
            new_latents, new_state = fn(self.params, latents, jnp.asarray(t),
                                        jnp.asarray(coeffs), jnp.asarray(guidance),
                                        cond, state)
            for i, req in enumerate(reqs):
                req.sampler_state = jax.tree.map(lambda a: a[i : i + 1], new_state)
        elif self._displaced_active():
            new_latents = self._denoise_group_displaced(
                res, reqs, bb, latents, t, coeffs, guidance, cond)
        elif self._deep_cache_active():
            new_latents = self._denoise_group_deep(res, reqs, bb, latents, t,
                                                   coeffs, guidance, cond)
        elif self._compact_cache_active():
            new_latents = self._denoise_group_compact(res, reqs, bb, latents,
                                                      t, coeffs, guidance, cond)
        else:
            fn = self._jit(("denoise", res, bb), self._denoise_fn)
            new_latents = fn(self.params, latents, jnp.asarray(t), jnp.asarray(coeffs),
                             jnp.asarray(guidance), cond)
        for i, req in enumerate(reqs):
            req.latents = new_latents[i : i + 1]
            req.sampler_table.advance()
            req.remain_steps -= 1

    def _stack_cond(self, conds: List[Dict[str, np.ndarray]], bb: int) -> Dict[str, jnp.ndarray]:
        out = {}
        for key in conds[0]:
            arr = np.concatenate([c[key] for c in conds], axis=0)
            out[key] = jnp.asarray(_pad_batch(arr, bb))
        return out

    def _denoise_fn(self, params, latents, t, coeffs, guidance, cond):
        """Jitted: CFG duplicate -> scale -> model -> combine -> sampler step."""
        noise_pred, c0, c1 = self._cfg_forward(params, latents, t, coeffs,
                                               guidance, cond)
        return self.sampler.step(latents, noise_pred, c0, c1)

    # -- compact top-K block cache on the dense path (cache mode "compact") ----

    def _compact_cache_active(self) -> bool:
        return (self.config.cache.enabled
                and self.config.cache.mode == "compact"
                and hasattr(self.bundle.denoiser, "cache_layout"))  # UNet only

    # -- batch-composition row-state store (serving row caches) ----------------

    def _comp_state_entry(self, kind, res, reqs, bb, sig, mk_state) -> dict:
        """Row-cache state keyed by batch COMPOSITION, LRU-bounded.

        Serving row caches used to live per REQUEST, gathered into a batch
        at step entry and scattered back at exit.  At full size that
        pattern is unserveable: SDXL compact rows are ~0.4 GB/request (b8 =
        3+ GB with up to 4 transient copies next to 5 GB of params), and
        the SD3 analog OOMed a 16 GB chip outright (sd3.py
        _sd3_state_entry, the same redesign).  Like displaced serving KV
        (_denoise_group_displaced), ONE state pytree lives per composition:
        a stable batch reuses it across steps with zero reshuffling; any
        change (membership, bucket, cache config) resets to fresh state.

        ``mk_state(n_rows)`` builds zero state for the CFG-doubled padded
        batch.  The entry is {"state": pytree, "anchored": False}; callers
        must run an ANCHORING step (full-capacity recompute that writes the
        out rows through) before trusting splices — splicing a fresh
        entry's zero "out" rows corrupts unselected rows.  (That flaw
        predates the store: a fresh per-request batch over capacity zero-
        spliced its first step too; anchoring fixes both.)
        """
        import collections

        if not hasattr(self, "_comp_state"):
            self._comp_state = collections.OrderedDict()
        key = (kind, res, bb, tuple(r.request_id for r in reqs), sig)
        entry = self._comp_state.get(key)
        if entry is None:
            entry = {"state": mk_state(2 * bb), "anchored": False}
            self._comp_state[key] = entry
        self._comp_state.move_to_end(key)
        # Count bound alone is HBM-blind: entry size scales with bucket x
        # resolution, and two big-bucket entries next to full-size params
        # OOMed the r2r hybrid prewarm (16 GB chip).  _trim_comp_state
        # evicts to the byte budget too, always keeping the newest entry.
        self._trim_comp_state()
        return entry

    def _comp_state_peek(self, kind, res, reqs, bb, sig):
        if not hasattr(self, "_comp_state"):
            return None
        return self._comp_state.get(
            (kind, res, bb, tuple(r.request_id for r in reqs), sig))

    def release_serving_state(self) -> None:
        """Drop every batch-composition cache/KV state store.

        The compiled programs (jit keys) stay warm — only device state goes.
        Engine.prewarm calls this between throwaway iterations: retained
        big-bucket entries from earlier prewarm rounds otherwise stack next
        to the live step's workspace (measured: r2r SDXL hybrid prewarm
        RESOURCE_EXHAUSTED at 1024^2 b8).  Post-release, the next step on
        any composition re-anchors (one full-capacity step), which serving
        pays on composition changes anyway."""
        for attr in ("_comp_state", "_sd3_state", "_disp_state",
                     "_deep_carry"):
            store = getattr(self, attr, None)
            if store is not None:
                store.clear()

    def evict_finished_state(self, req_ids) -> None:
        """Drop composition-state entries referencing any finished request.

        Every store keys by the exact request-id tuple, so once one member
        finishes (or aborts) that entry can NEVER be reused — yet it
        lingered in the LRU holding GBs of device state until count/byte
        eviction.  Measured consequence (r2y SDXL hybrid serving): a dead
        b8 1024^2 hybrid entry (~3.5 GB) stayed live through the batch's
        own postprocess and the VAE decode died RESOURCE_EXHAUSTED.  Called
        by postprocess (before the decode) and on aborts."""
        ids = set(req_ids)
        if not ids:
            return
        row_warm = getattr(self.config.cache, "deep_row_warmup", False)
        carry = getattr(self, "_deep_carry", None)
        if carry:
            # list() snapshots + tolerant pops: with async postprocess the
            # decode thread evicts while the serving loop inserts entries
            for k in [k for k in list(carry) if ids.intersection(k[2])]:
                carry.pop(k, None)
        for attr in ("_comp_state", "_sd3_state", "_disp_state"):
            store = getattr(self, attr, None)
            if not store:
                continue
            dead = [k for k in list(store)
                    if any(isinstance(part, tuple) and ids.intersection(part)
                           for part in k)]
            for k in dead:
                entry = store.pop(k, None)
                if entry is None:
                    continue
                if (attr == "_comp_state" and row_warm
                        and k[0] == "unet_hybrid"
                        and entry.get("anchored")):
                    # Row carry-over (deep_row_warmup): survivors keep
                    # their row caches in a SHRUNK entry — a finish event
                    # otherwise costs the next composition an anchoring
                    # full, the same class of cost admissions just stopped
                    # paying.  The full-size entry is still dropped before
                    # the decode (the r2y OOM).
                    live = [r for r in k[3] if r not in ids]
                    if live:
                        self._shrink_hybrid_entry(store, k, entry, live)

    def prewarm_carry_seeds(self, res: int, buckets) -> None:
        """Mint every composition-change program the bucket ladder can
        reach under deep_row_warmup x hybrid — carry SEEDS for same-bucket
        and adjacent-bucket transitions plus the finish SHRINK gathers — so
        no mid-serving composition change hits a cold compile (the r4d
        sd15 leg aborted 12.5% of its first pass on exactly that)."""
        import types as _types

        cc = self.config.cache
        if not (cc.enabled and cc.mode == "deep"
                and getattr(cc, "deep_row_warmup", False)
                and cc.deep_compact_fraction is not None
                and hasattr(self.bundle.denoiser, "_deep_tail")):
            return
        _, mk_state = self._hybrid_state_builder(res)
        sig = self._hybrid_sig()
        dtype = self._latent_dtype()
        bks = sorted(set(buckets))
        # the FULL pair product: rolling admissions jump buckets
        # non-adjacently (a 2->8 seed compiled mid-pass in r4e and stalled
        # 7-20 s under load); each seed program is small (~7 s compile,
        # cached persistently)
        pairs = {(o, n) for o in bks for n in bks}
        for old_b, new_b in sorted(pairs):
            ids = [f"seedmint-{res}-{old_b}-{new_b}-{i}"
                   for i in range(old_b)]
            self._comp_state_entry(
                "unet_hybrid", res,
                [_types.SimpleNamespace(request_id=i) for i in ids],
                old_b, sig, mk_state)
            keep = ids[: max(min(old_b, new_b) - 1, 1)]
            reqs2 = [_types.SimpleNamespace(request_id=i)
                     for i in (keep + [f"seedmint-fresh-{j}" for j in
                                       range(new_b - len(keep))])[:new_b]]
            self._hybrid_entry_carry(res, reqs2, new_b, sig, mk_state,
                                     dtype)
            self.release_serving_state()
        for b in bks:
            nb_targets = {bucket_for(m, tuple(bks))
                          for m in range(1, b)} if b > 1 else set()
            for nb in sorted(nb_targets):
                ids = tuple(f"shrinkmint-{res}-{b}-{nb}-{i}"
                            for i in range(b))
                if not hasattr(self, "_comp_state"):
                    import collections

                    self._comp_state = collections.OrderedDict()
                key = ("unet_hybrid", res, b, ids, sig)
                self._comp_state[key] = {"state": mk_state(2 * b),
                                         "anchored": True}
                live = list(ids[:nb])  # bucket_for(nb) == nb
                self._shrink_hybrid_entry(self._comp_state,
                                          key, self._comp_state.pop(key),
                                          live)
                self.release_serving_state()

    def _shrink_hybrid_entry(self, store, key, entry, live) -> None:
        """Gather the surviving requests' CFG-doubled rows into a
        smaller-bucket hybrid entry (padding repeats the last live row;
        row_valid masks pads at gate time) so _hybrid_entry_carry can seed
        the next composition from it."""
        kind, res, bb, ids, sig = key
        nb = bucket_for(len(live), self.config.scheduler.batch_buckets)
        pos = {rid: i for i, rid in enumerate(ids)}
        idx = [pos[live[min(j, len(live) - 1)]] for j in range(nb)]
        g = jnp.asarray(np.asarray(idx + [i + bb for i in idx]))

        def shrink_fn(old_state, gather):
            return jax.tree.map(lambda a: a[gather], old_state)

        state = self._jit(("hybrid_shrink", res, bb, nb, sig), shrink_fn,
                          donate=(0,))(entry["state"], g)
        store[(kind, res, nb, tuple(live), sig)] = {"state": state,
                                                    "anchored": True}
        self._trim_comp_state()

    def denoise_chunk(self, reqs_by_res, k: int,
                      allow_cold: bool = True) -> bool:
        """Run ``k`` sampler steps for the batch inside ONE jitted program
        (SchedulerConfig.steps_per_dispatch; in-graph fori_loop threading
        latents + cache/deep state — the serving analog of bench scan
        mode).  Returns True when the chunk executed (tables/latents
        advanced by ``k``), False when this configuration is ineligible —
        the worker then falls back to per-step dispatch.

        UNet dense-path support: plain dense, compact row cache, deep
        reuse, deep x compact hybrid — all at FIXED interval (the adaptive
        drift trigger and reuse-then-predict make per-step HOST decisions
        that cannot live in-graph; serving runs fixed interval 3).  Deep
        chunks start at a FULL boundary so the in-graph ``j % itv == 0``
        schedule matches the per-step path's lockstep ages (exactness:
        tests/test_unet_chunk.py)."""
        import jax.numpy as jnp

        self._production_stamp()
        ordered = [r for res in sorted(reqs_by_res) for r in reqs_by_res[res]]
        if not ordered or k <= 1:
            return False
        cc = self.config.cache
        if (len({r.resolution for r in ordered}) != 1
                or self.sampler.needs_state
                or any(r.remain_steps < k for r in ordered)
                or getattr(self.config.parallel, "sp_mode", None)
                == "displaced"):
            return False
        res = ordered[0].resolution
        b = len(ordered)
        bb = bucket_for(b, self.config.scheduler.batch_buckets)
        itv = max(cc.deep_interval, 1)
        mode = "dense"
        cache = None
        entry = None
        sel_plan = None
        if cc.enabled and cc.mode == "deep":
            if (getattr(cc, "deep_adaptive", 0.0)
                    or float(getattr(cc, "deep_predict", 0.0) or 0.0)):
                return False
            row_warm = (getattr(cc, "deep_row_warmup", False)
                        and hasattr(self.bundle.denoiser, "_deep_tail"))
            if row_warm and itv > 1:
                # PARTIAL chunk: every in-chunk step refreshes a
                # host-scheduled kb-row selection (act=1), interval
                # expiries run aligned fulls in-graph (act=2) — no
                # full-boundary or no-warmup-rows eligibility left, so
                # chunks stay engaged under rolling admissions (the r3r
                # regression's fix).  The hybrid variant threads the
                # composition row caches through the same 3-way switch.
                sel_plan = self._plan_partial_chunk(ordered, k, itv, bb)
                if sel_plan is None:
                    return False
                if cc.deep_compact_fraction is not None:
                    mode = "hybrid_partial"
                    _, mk_state = self._hybrid_state_builder(res)
                    entry, fresh_pairs = self._hybrid_entry_carry(
                        res, ordered, bb, self._hybrid_sig(), mk_state,
                        self._latent_dtype())
                    if cc.deep_compact_pairwise:
                        cap = max(1, round(bb * cc.deep_compact_fraction))
                    else:
                        cap = max(1, round(2 * bb
                                           * cc.deep_compact_fraction)) // 2
                    if not entry["anchored"] or fresh_pairs > cap:
                        return False  # per-step anchoring full runs first
                else:
                    mode = "partial"
            else:
                if any(r.sampler_table.step < cc.deep_warmup
                       for r in ordered):
                    return False
                mode = ("hybrid" if cc.deep_compact_fraction is not None
                        else "deep")
                # the chunk must START where the per-step path would run a
                # FULL pass (lockstep ages from j=0); seeding the carry
                # also needs every request's deep feature in dense layout
                shapes = {None if r.deep_state is None else
                          tuple(r.deep_state.shape) for r in ordered}
                if None in shapes or len(shapes) != 1 \
                        or next(iter(shapes))[0] != 2:
                    return False
                if not any(r.deep_age + 1 >= itv for r in ordered):
                    return False
        elif cc.enabled and cc.mode == "compact":
            if not self._compact_cache_active():
                return False
            mode = "compact"
        elif cc.enabled:
            return False  # "block" masked mode: per-step only
        if mode in ("hybrid", "compact"):
            from sduss_tpu.cache.manager import BlockCache

            if not hasattr(self, "_cache_obj"):
                self._cache_obj = BlockCache(cc)
            cache = self._cache_obj
            dtype = self._latent_dtype()
            if mode == "hybrid":
                layout = self._hybrid_layout(res)
                sig = self._hybrid_sig()
                kind = "unet_hybrid"
            else:
                cells = res // self.vae_scale
                layout = self.bundle.denoiser.cache_layout(
                    cells, cc.min_level)
                sig = (type(cache).__name__, cc.min_level,
                       cc.compact_fraction)
                kind = "unet_compact"

            def mk_state(n):
                return {key: cache.init_rows(key, n, s, ci, co, dtype)
                        for key, (s, ci, co) in layout.items()}

            entry = self._comp_state_entry(kind, res, ordered, bb, sig,
                                           mk_state)
            if mode == "compact" and not entry["anchored"]:
                return False  # the anchoring sync program runs per-step

        if mode in ("partial", "hybrid_partial"):
            chunk_key = ("unet_chunk", mode, res, bb, k, sel_plan[3])
        else:
            chunk_key = ("unet_chunk", mode, res, bb, k)
        if not allow_cold and chunk_key not in self._executed_keys:
            return False

        ts = np.zeros((k, bb), np.float32)
        cs = np.ones((k, bb, 2), np.float32)
        for i, r in enumerate(ordered):
            tbl = r.sampler_table
            s0 = tbl.step
            ts[:, i] = tbl.timesteps[s0 : s0 + k]
            cs[:, i] = tbl.coeffs[s0 : s0 + k]
        guidance = np.zeros((bb,), np.float32)
        guidance[:b] = [r.params.guidance_scale if r.params.guidance_scale
                        is not None else self.spec.default_guidance
                        for r in ordered]
        cond = self._stack_cond([r.conditioning for r in ordered], bb)
        latents = jnp.concatenate([r.latents for r in ordered], axis=0)
        if bb != b:
            latents = jnp.concatenate(
                [latents, jnp.repeat(latents[-1:], bb - b, axis=0)], axis=0)

        args = [self.params, latents, jnp.asarray(ts), jnp.asarray(cs),
                jnp.asarray(guidance), cond]
        donate = ()
        if mode in ("deep", "hybrid"):
            # batch-form deep carry ([uncond x bb | cond x bb], matching
            # _cfg_step's concat order); overwritten by the j=0 full pass
            u = [r.deep_state[0:1] for r in ordered]
            c = [r.deep_state[1:2] for r in ordered]
            pad = bb - b
            if pad:
                u += [u[-1]] * pad
                c += [c[-1]] * pad
            args += [jnp.concatenate(u + c, axis=0), jnp.int32(itv)]
        elif mode in ("partial", "hybrid_partial"):
            cached = self._deep_carry_get(
                (res, bb, tuple(r.request_id for r in ordered)), ordered)
            if cached is not None:
                carry = cached  # per-step path keeps it in sync
            else:
                # zeros for rows awaiting their first refresh (sel[0]
                # includes them, the in-graph scatter overwrites them
                # before any read)
                want = self._deep_state_shape(res)
                zero = self._deep_zeros_shape(want, self._latent_dtype())
                states = [r.deep_state if r.deep_state is not None
                          and tuple(r.deep_state.shape) == want else zero
                          for r in ordered]
                u = [s[0:1] for s in states]
                c = [s[1:2] for s in states]
                pad = bb - b
                if pad:
                    u += [u[-1]] * pad
                    c += [c[-1]] * pad
                carry = jnp.concatenate(u + c, axis=0)
            args.append(carry)
            if mode == "hybrid_partial":
                row_valid = np.zeros((bb,), bool)
                row_valid[:b] = True
                donate = (len(args),)  # entry state: multi-GB at b8
                args += [entry["state"], jnp.asarray(row_valid)]
            args += [jnp.asarray(sel_plan[0]), jnp.asarray(sel_plan[1])]
        if mode in ("hybrid", "compact"):
            row_valid = np.zeros((bb,), bool)
            row_valid[:b] = True
            # donate the row state: ~4 GB at SDXL b8 1024^2 — old+new
            # copies live together OOM the chip (the r2v prewarm lesson)
            donate = (len(args),)
            args += [entry["state"], jnp.asarray(row_valid)]

        fn = self._jit(chunk_key, self._make_unet_chunk_fn(mode, k, cache),
                       donate=donate)
        out = fn(*args)
        new_latents = out[0]
        pos = 1
        deep_modes = ("deep", "hybrid", "partial", "hybrid_partial")
        if mode in deep_modes:
            deep_out = out[pos]
            pos += 1
        if mode in ("hybrid", "compact", "hybrid_partial"):
            entry["state"] = out[pos]
            entry["anchored"] = True
        self._executed_keys.add(chunk_key)
        for i, r in enumerate(ordered):
            r.latents = new_latents[i : i + 1]
            if mode in deep_modes:
                r.deep_state = jnp.stack([deep_out[i], deep_out[bb + i]],
                                         axis=0)
                r.deep_age = (sel_plan[2][i]
                              if mode in ("partial", "hybrid_partial")
                              else (k - 1) % itv)
                r.deep_slope = None
            for _ in range(k):
                r.sampler_table.advance()
            r.remain_steps -= k
        if mode in deep_modes and getattr(cc, "deep_row_warmup", False):
            # post-update put: tokens = the freshly assigned deep states
            self._deep_carry_put(
                (res, bb, tuple(r.request_id for r in ordered)), deep_out,
                ordered)
        return True

    def _make_unet_chunk_fn(self, mode: str, k: int, cache=None):
        """Traced k-step loop over the SAME per-step builders
        (_denoise_fn / _make_compact_fn / _make_deep_fn /
        _make_deep_hybrid_fn); deep modes select full/shallow in-graph by
        ``j % itv == 0`` (chunks start at full boundaries), so the program
        contains each body once."""
        import jax

        if mode == "partial":
            p_f = self._make_deep_partial_fn()
            sh_f = self._make_deep_fn("shallow")
            full_f = self._make_deep_fn("full")

            def fn(params, lat, ts, cs, guidance, cond, deep0, sel_arr,
                   act_arr):
                def body(j, carry):
                    lat, dp = carry
                    return jax.lax.switch(
                        act_arr[j],
                        [lambda a: sh_f(params, a[0], ts[j], cs[j],
                                        guidance, cond, a[1]),
                         lambda a: p_f(params, a[0], ts[j], cs[j],
                                       guidance, cond, a[1], sel_arr[j]),
                         lambda a: full_f(params, a[0], ts[j], cs[j],
                                          guidance, cond, a[1])],
                        (lat, dp))

                return jax.lax.fori_loop(0, k, body, (lat, deep0))

            return fn
        if mode == "hybrid_partial":
            hp_f = self._make_deep_hybrid_partial_fn()
            hs_f = self._make_deep_hybrid_fn("shallow")
            hf_f = self._make_deep_hybrid_fn("full")

            def fn(params, lat, ts, cs, guidance, cond, deep0, state0,
                   row_valid, sel_arr, act_arr):
                def body(j, carry):
                    lat, dp, st = carry
                    return jax.lax.switch(
                        act_arr[j],
                        [lambda a: hs_f(params, a[0], ts[j], cs[j],
                                        guidance, cond, a[1], a[2],
                                        row_valid),
                         lambda a: hp_f(params, a[0], ts[j], cs[j],
                                        guidance, cond, a[1], a[2],
                                        row_valid, sel_arr[j]),
                         lambda a: hf_f(params, a[0], ts[j], cs[j],
                                        guidance, cond, a[1], a[2],
                                        row_valid)],
                        (lat, dp, st))

                return jax.lax.fori_loop(0, k, body, (lat, deep0, state0))

            return fn
        if mode == "deep":
            full_f = self._make_deep_fn("full")
            sh_f = self._make_deep_fn("shallow")

            def fn(params, lat, ts, cs, guidance, cond, deep0, itv):
                def body(j, carry):
                    lat, dp = carry
                    return jax.lax.cond(
                        j % itv == 0,
                        lambda a: full_f(params, a[1], ts[a[0]], cs[a[0]],
                                         guidance, cond, a[2]),
                        lambda a: sh_f(params, a[1], ts[a[0]], cs[a[0]],
                                       guidance, cond, a[2]),
                        (j, lat, dp))

                lat, dp = jax.lax.fori_loop(0, k, body, (lat, deep0))
                return lat, dp

            return fn
        if mode == "hybrid":
            full_f = self._make_deep_hybrid_fn("full")
            sh_f = self._make_deep_hybrid_fn("shallow")

            def fn(params, lat, ts, cs, guidance, cond, deep0, itv,
                   state0, row_valid):
                def body(j, carry):
                    lat, dp, st = carry
                    return jax.lax.cond(
                        j % itv == 0,
                        lambda a: full_f(params, a[1], ts[a[0]], cs[a[0]],
                                         guidance, cond, a[2], a[3],
                                         row_valid),
                        lambda a: sh_f(params, a[1], ts[a[0]], cs[a[0]],
                                       guidance, cond, a[2], a[3],
                                       row_valid),
                        (j, lat, dp, st))

                return jax.lax.fori_loop(0, k, body, (lat, deep0, state0))

            return fn
        if mode == "compact":
            step_f = self._make_compact_fn(cache, sync=False)

            def fn(params, lat, ts, cs, guidance, cond, state0, row_valid):
                def body(j, carry):
                    lat, st = carry
                    return step_f(params, lat, ts[j], cs[j], guidance,
                                  cond, st, row_valid)

                return jax.lax.fori_loop(0, k, body, (lat, state0))

            return fn

        def fn(params, lat, ts, cs, guidance, cond):
            def body(j, lat):
                return self._denoise_fn(params, lat, ts[j], cs[j],
                                        guidance, cond)

            return (jax.lax.fori_loop(0, k, body, lat),)

        return fn

    def serving_state_spec(self, res: int, bucket: int):
        """ABSTRACT (eval_shape) composition state a uniform (res, bucket)
        dense-path step would mint — traced over the SAME builders the step
        uses (init_rows incl. slope/seen predict extras), so capacity
        estimates can never drift from what the step actually allocates.
        None when the configuration mints no composition state."""
        import jax

        cc = self.config.cache
        if not cc.enabled:
            return None
        from sduss_tpu.cache.manager import BlockCache

        if not hasattr(self, "_cache_obj"):
            self._cache_obj = BlockCache(cc)
        cache = self._cache_obj
        if cc.mode == "deep" and cc.deep_compact_fraction is not None:
            layout = self._hybrid_layout(res)
        elif cc.mode == "compact":
            cells = res // self.vae_scale
            layout = self.bundle.denoiser.cache_layout(cells, cc.min_level)
        else:
            return None
        dtype = self._latent_dtype()
        n = 2 * bucket

        def build():
            return {key: cache.init_rows(key, n, s, ci, co, dtype)
                    for key, (s, ci, co) in layout.items()}

        return jax.eval_shape(build)

    def estimate_serving_state_bytes(self, res: int, bucket: int) -> int:
        """Device bytes the (res, bucket) step's composition state needs —
        shape math only, nothing allocated (Engine.prewarm capacity gate)."""
        import math

        import jax
        import jax.numpy as jnp

        spec = self.serving_state_spec(res, bucket)
        if spec is None:
            return 0
        return sum(math.prod(leaf.shape) * jnp.dtype(leaf.dtype).itemsize
                   for leaf in jax.tree.leaves(spec))

    def device_param_bytes(self) -> int:
        """Bytes of the replica's resident device params (host-spilled
        encoder subtrees excluded — they are not on the chip)."""
        import jax

        return sum(getattr(leaf, "nbytes", 0)
                   for leaf in jax.tree.leaves(self.params))

    def _denoise_group_compact(self, res, reqs, bb, latents, t, coeffs,
                               guidance, cond):
        """Dense-path denoise with per-block top-K compact recompute.

        Rows are whole images (CFG-doubled), independent under every UNet
        block, so each gated block gathers its n_active most-drifted rows,
        recomputes them, and splices cached outputs for the rest — REAL
        per-row-adaptive compute saving (the static-shape counterpart of the
        reference's threshold cache, cache_manager.py:101-191).  State lives
        per batch composition (_comp_state_entry); a fresh composition's
        first step runs the full-capacity SYNC program to anchor the rows.
        """
        from sduss_tpu.cache.manager import BlockCache

        if not hasattr(self, "_cache_obj"):
            self._cache_obj = BlockCache(self.config.cache)
        cache = self._cache_obj
        cells = res // self.vae_scale
        layout = self.bundle.denoiser.cache_layout(
            cells, self.config.cache.min_level)
        dtype = self._latent_dtype()
        b = len(reqs)
        sig = (type(cache).__name__, self.config.cache.min_level,
               self.config.cache.compact_fraction)

        def mk_state(n):
            return {key: cache.init_rows(key, n, s, c_in, c_out, dtype)
                    for key, (s, c_in, c_out) in layout.items()}

        entry = self._comp_state_entry("unet_compact", res, reqs, bb, sig,
                                       mk_state)
        sync = not entry["anchored"]
        row_valid = np.zeros((bb,), bool)
        row_valid[:b] = True
        # donate the row state (arg 6): old+new copies of the multi-GB
        # cache pytree must never be live together (r2v prewarm OOM)
        fn = self._jit(("denoise_compact", res, bb, sync),
                       self._make_compact_fn(cache, sync), donate=(6,))
        new_latents, new_state = fn(self.params, latents, jnp.asarray(t),
                                    jnp.asarray(coeffs), jnp.asarray(guidance),
                                    cond, entry["state"],
                                    jnp.asarray(row_valid))
        entry["state"] = new_state
        entry["anchored"] = True
        return new_latents

    def _make_compact_fn(self, cache, sync: bool = False):
        def fn(params, latents, t, coeffs, guidance, cond, cache_state,
               row_valid):
            rv2 = jnp.concatenate([row_valid, row_valid], axis=0)
            noise_pred, c0, c1, new_state = self._cfg_step(
                latents, t, coeffs, guidance,
                lambda lat_in, t2: self.denoiser_forward(
                    params, lat_in, t2, cond, cache=cache,
                    cache_state=cache_state, row_valid=rv2,
                    compact_sync=sync))
            return self.sampler.step(latents, noise_pred, c0, c1), new_state

        return fn

    # -- temporal deep-block reuse (cache mode "deep") -------------------------

    # -- displaced (stale-KV) sequence parallelism on the serving path ---------

    def _warn_once(self, msg: str) -> None:
        if not hasattr(self, "_warned"):
            self._warned = set()
        if msg not in self._warned:
            self._warned.add(msg)
            logger.warning(msg)

    def _displaced_requested(self) -> bool:
        return (self.config.parallel.sp_mode == "displaced"
                and self.placement is not None
                and self.placement.mesh is not None
                and "sp" in self.placement.mesh.axis_names
                and self.placement.mesh.shape["sp"] > 1)

    def _displaced_active(self) -> bool:
        """Serve the dense step through the stale-KV shard_map path?

        The DistriFuser latency trick (reference distrifuser/utils.py:23-66,
        modules/pp/attn.py:110-200) under CONTINUOUS BATCHING: KV state is
        valid only while the batch composition is unchanged, so admissions /
        finishes are state boundaries that re-run ``displaced_warmup`` sync
        (fresh-gather, exact) steps — the same re-synchronization shape the
        deep cache solves with phase-aligned admission (docs/DESIGN.md
        round-3 note).

        Cache composition (round 3): the PLAIN deep cache (fixed interval,
        no hybrid rows / adaptive refresh / compact gathers) rides this
        seam — full/shallow steps each carry their OWN per-program stale-KV
        dict (attention-site keys are per-program counters) and the deep
        feature is composition-keyed sharded state.  Gated cache modes
        (hybrid/compact/fine) keep GSPMD precedence: their row gathers are
        batch-global and don't shard over 'sp' rows here (the runner-level
        token composition in parallel/displaced.py covers that shape).
        """
        if not self._displaced_requested():
            return False
        if self.config.cache.enabled and not self._displaced_deep_ok():
            self._warn_once("displaced sp_mode: this cache configuration "
                            "takes precedence — serving on the GSPMD path "
                            "(plain deep interval composes; hybrid/compact/"
                            "adaptive do not)")
            return False
        return True

    def _displaced_deep_ok(self) -> bool:
        """Does the enabled cache compose with the displaced serving seam?
        Plain fixed-interval deep reuse only (UNet families) — the shared
        predicate lives on CacheConfig.plain_fixed_deep so the scheduler's
        admission mirror (esymred._displaced_defer) can never drift."""
        return (self.config.cache.plain_fixed_deep()
                and hasattr(self.bundle.denoiser, "cache_layout"))

    def _displaced_ctx_cls(self):
        """ctx class for the sharded denoiser seam (SD3 overrides)."""
        from sduss_tpu.parallel.displaced import ShardContext

        return ShardContext

    def _denoise_group_displaced(self, res, reqs, bb, latents, t, coeffs,
                                 guidance, cond):
        """One serving denoise step under displaced-SP.

        Per-(res, bucket) KV state lives on ``self._disp_state`` across
        engine iterations: {"comp": request-id tuple, "kv": pytree,
        "warm": sync steps done}.  Composition change => reset.  The first
        ``displaced_warmup`` steps of a composition gather fresh KV (exact);
        later steps splice their own fresh rows into the stale full KV and
        emit next-step gathers that XLA overlaps with remaining compute.
        """
        import collections

        if not hasattr(self, "_disp_state"):
            self._disp_state = collections.OrderedDict()
        # Key state by the COMPOSITION itself (not just (res, bucket)): the
        # scheduler may interleave different same-bucket batches, and each
        # keeps its own valid KV instead of thrashing sync warmup.  LRU
        # eviction bounds HBM held by stale-KV pytrees.
        comp = tuple(r.request_id for r in reqs)
        key = (res, bb, comp)
        st = self._disp_state.get(key)
        if st is None:
            st = {"comp": comp, "kv": {}, "warm": 0,
                  "deep": None, "deep_age": 0}
            self._disp_state[key] = st
        self._disp_state.move_to_end(key)
        while len(self._disp_state) > 4:
            self._disp_state.popitem(last=False)

        # Plain-deep composition (see _displaced_deep_ok): mode chosen
        # exactly like _denoise_group_deep, but the deep feature is
        # COMPOSITION state (sharded over 'sp' with the latents) — a
        # composition change resets it alongside the KV, which aligns the
        # forced full pass with the displaced sync warmup.
        deep_on = self.config.cache.enabled and self._displaced_deep_ok()
        if deep_on:
            interval, warmup_deep, _ = self._deep_policy()
            steps_done = min(r.sampler_table.step for r in reqs)
            need_full = (st["deep"] is None
                         or st["deep_age"] >= interval - 1
                         or steps_done < warmup_deep)
            mode = "full" if need_full else "shallow"
        else:
            mode = None
        # Full and shallow are different traced programs visiting different
        # attention sites, and ShardContext keys KV by a per-program call
        # counter — each mode therefore carries its OWN stale-KV dict.
        # FULL steps always run SYNC (fresh gathers): their per-mode dict
        # is only written once per interval, so "stale" there would mean
        # interval-steps-old KV — far outside the 1-step displacement the
        # approximation is validated for (review r3 finding).  Fulls are
        # 1/interval of steps; the gather cost there is marginal.  Shallow
        # steps update their dict every step, keeping their staleness at
        # ~1 step (2 across a full boundary).
        kv = st["kv"].setdefault(mode or "dense", {})
        stale = (st["warm"] >= self.config.parallel.displaced_warmup
                 and bool(kv) and mode != "full")
        # donate the threaded KV pytree (arg 6): full-sequence K/V for
        # every attention is multi-GB at full size; old+new copies across
        # the step would halve serving headroom (same aliasing rationale
        # as the hybrid/compact cache states)
        fn = self._jit(("denoise_displaced", res, bb, stale, mode),
                       self._make_displaced_fn(stale, mode), donate=(6,))
        if mode == "full":
            new_latents, new_kv, deep_out = fn(
                self.params, latents, jnp.asarray(t), jnp.asarray(coeffs),
                jnp.asarray(guidance), cond, kv)
            st["deep"] = deep_out
            st["deep_age"] = 0
        elif mode == "shallow":
            new_latents, new_kv = fn(
                self.params, latents, jnp.asarray(t), jnp.asarray(coeffs),
                jnp.asarray(guidance), cond, kv, st["deep"])
            st["deep_age"] += 1
        else:
            new_latents, new_kv = fn(
                self.params, latents, jnp.asarray(t), jnp.asarray(coeffs),
                jnp.asarray(guidance), cond, kv)
        st["kv"][mode or "dense"] = new_kv
        st["warm"] += 1
        if deep_on:
            # Mirror onto the requests so ESyMReD's deep-phase admission
            # gate (_deep_defer) sees the real full/shallow cadence; the
            # shared reference costs nothing, and its (2B, ...) layout
            # forces a fresh full pass if a request ever re-routes to the
            # dense deep path (shape check in _denoise_group_deep).
            for r in reqs:
                r.deep_state = st["deep"]
                r.deep_age = st["deep_age"]
        return new_latents

    def _make_displaced_fn(self, stale: bool, deep_mode=None):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.placement.mesh
        ctx_cls = self._displaced_ctx_cls()
        deep_kw = {} if deep_mode is None else {"deep_mode": deep_mode}

        def local_step(params, x, t, coeffs, guidance, cond, kv_state,
                       deep=None):
            ctx = ctx_cls(axis="sp", stale=stale, kv_state=kv_state)
            kw = dict(deep_kw)
            if deep_mode == "shallow":
                kw["deep_state"] = deep
            noise_pred, c0, c1, deep_out = self._cfg_step(
                x, t, coeffs, guidance,
                lambda lat_in, t2: self.denoiser_forward(
                    params, lat_in, t2, cond, ctx=ctx, **kw))
            new_x = self.sampler.step(x, noise_pred, c0, c1)
            if deep_mode == "full":
                return new_x, ctx.new_kv_state, deep_out
            return new_x, ctx.new_kv_state

        def wrapped(params, x, t, coeffs, guidance, cond, kv_state,
                    deep=None):
            spec_x = P(None, "sp", None, None)
            # P() is a PREFIX spec over whole subtrees: params/cond/KV are
            # replicated across 'sp' (all_gathered KV is full-sequence).
            # The deep feature is SPATIAL (rows of the latent image), so it
            # shards over 'sp' exactly like the latents.
            kv_specs = jax.tree.map(lambda _: P(), kv_state)
            if deep_mode == "shallow":
                fn = shard_map(
                    local_step, mesh=mesh,
                    in_specs=(P(), spec_x, P(), P(), P(), P(), kv_specs,
                              spec_x),
                    out_specs=(spec_x, P()), check_vma=False)
                return fn(params, x, t, coeffs, guidance, cond, kv_state,
                          deep)
            out_specs = ((spec_x, P(), spec_x) if deep_mode == "full"
                         else (spec_x, P()))
            fn = shard_map(
                local_step, mesh=mesh,
                in_specs=(P(), spec_x, P(), P(), P(), P(), kv_specs),
                out_specs=out_specs, check_vma=False)
            return fn(params, x, t, coeffs, guidance, cond, kv_state)

        return wrapped

    def _deep_cache_active(self) -> bool:
        return (self.config.cache.enabled
                and self.config.cache.mode == "deep"
                and hasattr(self.bundle.denoiser, "cache_layout"))  # UNet only

    def _deep_factor(self) -> int:
        """Spatial downscale of the deep feature vs the latent (2^(B-1))."""
        n_levels = len(self.bundle.denoiser.cfg.block_out_channels)
        boundary = (self.config.cache.deep_boundary
                    if self.config.cache.deep_boundary is not None
                    else n_levels - 1)
        return 2 ** max(boundary - 1, 0)

    def _denoise_group_deep(self, res, reqs, bb, latents, t, coeffs, guidance,
                            cond):
        """Alternate full / shallow steps, threading per-request deep features.

        The batch shares one mode per call (static shapes): full whenever any
        member lacks a fresh deep feature, else shallow until deep_interval.
        """
        interval, warmup, adaptive = self._deep_policy()
        cc = self.config.cache
        hybrid = cc.deep_compact_fraction is not None
        dense_hw = latents.shape[1] // self._deep_factor()

        def _warm_need(r):
            # admission-type needs: no usable dense feature yet (new
            # request, patched-path layout flip) or trajectory warmup
            return (r.deep_state is None
                    or r.deep_state.shape[0] != 2
                    or r.deep_state.shape[1] != dense_hw
                    or r.sampler_table.step < warmup)

        def _expired(r):
            return (r.deep_age >= interval - 1
                    or (adaptive and self._drift_exceeds(r)))

        need = [i for i, r in enumerate(reqs) if _warm_need(r)]
        # Interval/adaptive expiry stays BATCH-wide: one aligned full
        # refreshes every row and re-syncs ages, which beats staggered
        # per-row refreshes — small-k deep tails run ~1.8x/row less
        # efficiently than the batched tail (chip, r4a i24: aligned warm
        # step 177.3 ms vs staggered 201.2; model full 830 / shallow 149 /
        # one-request tail 157 ms).  Row-granular "partial" programs serve
        # ONLY admission warmup, the case that floored serving at ~10%
        # fulls (exp/serving_sdxl_bdy1_i24_v5e_r3u.json).
        expiry = any(_expired(r) for r in reqs if not _warm_need(r))
        row_warm_ok = (cc.deep_row_warmup
                       and hasattr(self.bundle.denoiser, "_deep_tail"))
        entry = None
        if hybrid:
            _, mk_state = self._hybrid_state_builder(res)
            if row_warm_ok:
                # row CARRY-OVER: an admission seeds the new composition's
                # row caches from the previous one's surviving rows — the
                # anchoring full is only needed when the fresh pairs exceed
                # the gate capacity (their forced top-K selection is then
                # no longer guaranteed and a zero-state row could splice)
                entry, fresh_pairs = self._hybrid_entry_carry(
                    res, reqs, bb, self._hybrid_sig(), mk_state,
                    self._latent_dtype())
                if cc.deep_compact_pairwise:
                    cap = max(1, round(bb * cc.deep_compact_fraction))
                else:
                    cap = max(1, round(2 * bb
                                       * cc.deep_compact_fraction)) // 2
                if fresh_pairs > cap or not entry["anchored"]:
                    expiry = True
            else:
                entry = self._comp_state_entry(
                    "unet_hybrid", res, reqs, bb, self._hybrid_sig(),
                    mk_state)
                if not entry["anchored"]:
                    # fresh composition row state: the full step's write-
                    # through is the anchoring sync (splicing zero out rows
                    # would corrupt)
                    expiry = True
        kb = 1
        while kb < len(need):
            kb *= 2
        partial = (row_warm_ok and not expiry
                   and 0 < len(need) < len(reqs) and kb < bb)
        mode = ("partial" if partial
                else "full" if (need or expiry) else "shallow")
        need_set = set(need)

        if mode == "shallow":
            states = [self._deep_predicted(r) for r in reqs]
        elif mode == "partial":
            # carry rows for refreshed requests are overwritten in-graph by
            # the scatter; feed their stale state when the shape fits (no
            # fresh allocation) and a cached zeros tensor otherwise (new
            # request / layout flip).  A valid template always exists:
            # len(need) < len(reqs) means some row passed every shape check.
            tmpl = next(r.deep_state for i, r in enumerate(reqs)
                        if i not in need_set)
            states = [
                (r.deep_state if i in need_set
                 and r.deep_state is not None
                 and r.deep_state.shape == tmpl.shape
                 else self._deep_zeros(tmpl) if i in need_set
                 else self._deep_predicted(r))
                for i, r in enumerate(reqs)]
        # Batch-form deep CARRY reuse (deep_row_warmup serving): rebuilding
        # the carry from per-request slices costs ~4 device-op dispatches
        # per request per step (33 at b8) — on the axon relay that is a
        # measurable per-step tax (bs-proportional iteration deltas,
        # exp/serving_sdxl_bdy1_i12_rowwarm_v5e_r4a.json schedule log).
        # Every step's deep_out IS the next step's carry for a stable
        # composition (shallow passes it through, partial scatters into it,
        # full rebuilds it), so cache it composition-keyed; per-request
        # r.deep_state stays authoritative for mode decisions and is
        # updated on every refresh, and any externally-written state
        # (patched-path layout flip) surfaces as a warm need whose scatter
        # overwrites the stale carry row in the same step.
        carry_key = (res, bb, tuple(r.request_id for r in reqs))
        use_carry = (row_warm_ok and not cc.deep_predict)
        cached = self._deep_carry_get(carry_key, reqs) if use_carry else None
        if mode == "full":
            deep = None
        elif cached is not None:
            deep = cached
        else:
            u = [s[0:1] for s in states]
            c = [s[1:2] for s in states]
            pad = bb - len(reqs)
            if pad:
                u += [u[-1]] * pad
                c += [c[-1]] * pad
            deep = jnp.concatenate(u + c, axis=0)

        sel = None
        if mode == "partial":
            sel = np.full((kb,), need[0], np.int32)
            sel[: len(need)] = need
        if hybrid:
            new_latents, deep_out = self._deep_hybrid_call(
                res, reqs, bb, latents, t, coeffs, guidance, cond, mode,
                deep, entry, sel=sel, kb=kb)
        elif mode == "partial":
            fn = self._jit(("denoise_deep", "partial", res, bb, kb),
                           self._make_deep_partial_fn())
            new_latents, deep_out = fn(self.params, latents, jnp.asarray(t),
                                       jnp.asarray(coeffs),
                                       jnp.asarray(guidance), cond, deep,
                                       jnp.asarray(sel))
        else:
            fn = self._jit(("denoise_deep", mode, res, bb),
                           self._make_deep_fn(mode))
            new_latents, deep_out = fn(self.params, latents, jnp.asarray(t),
                                       jnp.asarray(coeffs),
                                       jnp.asarray(guidance), cond, deep)
        refreshed = set(range(len(reqs))) if mode == "full" else (
            set(need) if mode == "partial" else set())
        for i, r in enumerate(reqs):
            if i in refreshed:
                new = jnp.stack([deep_out[i], deep_out[bb + i]], axis=0)
                self._deep_update_slope(r, new)
                r.deep_state = new
                r.deep_age = 0
            else:
                r.deep_age += 1
            if adaptive:
                # refreshed: the reference is the latent the deep features
                # were computed FROM (the step's input); else this step's
                # output is the next decision's current latent
                self._note_drift(r, "full" if i in refreshed else "shallow",
                                 latents[i : i + 1] if i in refreshed
                                 else new_latents[i : i + 1])
        if use_carry:
            # post-update: the stored identity tokens must be the states
            # the next step's mode decision will see
            self._deep_carry_put(carry_key, deep_out, reqs)
        return new_latents

    def _deep_carry_get(self, key, reqs):
        """Cached batch-form deep carry for this exact composition — valid
        only while every member's r.deep_state is the SAME OBJECT recorded
        at put time (strong refs held, so identity comparison is exact): a
        request refreshed in another composition meanwhile invalidates."""
        store = getattr(self, "_deep_carry", None)
        if store is None:
            return None
        v = store.get(key)
        if v is None:
            return None
        carry, tokens = v
        if len(tokens) != len(reqs) or any(
                t is not r.deep_state for t, r in zip(tokens, reqs)):
            del store[key]
            return None
        store.move_to_end(key)
        return carry

    def _deep_carry_put(self, key, carry, reqs) -> None:
        import collections

        store = getattr(self, "_deep_carry", None)
        if store is None:
            store = self._deep_carry = collections.OrderedDict()
        store[key] = (carry, [r.deep_state for r in reqs])
        store.move_to_end(key)
        while len(store) > 2:  # current + one predecessor composition
            store.popitem(last=False)

    def _deep_zeros(self, tmpl):
        """Cached zero deep-feature tensor matching ``tmpl``'s shape/dtype
        (one device allocation per shape, reused across admissions)."""
        return self._deep_zeros_shape(tuple(tmpl.shape), tmpl.dtype)

    def _deep_zeros_shape(self, shape, dtype):
        key = (tuple(shape), str(dtype))
        cache = getattr(self, "_deep_zeros_cache", None)
        if cache is None:
            cache = self._deep_zeros_cache = {}
        if key not in cache:
            cache[key] = jnp.zeros(shape, dtype)
        return cache[key]

    def _deep_state_shape(self, res: int):
        """Per-request dense deep-feature shape (2, h', w', C) at ``res``:
        spatial of level boundary-1, channels of the deepest cached up
        block's upsample conv (models/unet.py apply: the feature captured
        entering up block ``n_levels - boundary``)."""
        cfg = self.bundle.denoiser.cfg
        n = len(cfg.block_out_channels)
        bdy = self.config.cache.deep_boundary
        bdy = max(1, min(bdy if bdy is not None else n - 1, n - 1))
        hw = (res // self.vae_scale) >> max(bdy - 1, 0)
        return (2, hw, hw, cfg.block_out_channels[bdy])

    def _plan_partial_chunk(self, ordered, k: int, itv: int, bb: int):
        """Host-side row-refresh schedule for a k-step PARTIAL chunk
        (deep_row_warmup x steps_per_dispatch): ages/warmup evolve
        deterministically inside the window, so the per-step selection the
        per-step path would make is precomputable — each in-chunk step j
        refreshes sel[j] (kb ADMISSION rows: missing-state/warmup, exactly
        the per-step policy in _denoise_group_deep), steps where an
        incumbent's interval expires run a batch-wide FULL (act[j] = 2,
        re-syncing every age — aligned fulls beat staggered per-row
        refreshes, see _denoise_group_deep), and steps with no needs run
        shallow (act[j] = 0).  Returns (sel[k, kb] int32, act[k] int32,
        final_ages, kb) or None when the window's warm needs reach the
        bucket (degenerate: per-step dispatch decides).

        This is what makes chunked dispatch compose with rolling
        admissions: the r3r SDXL chunk leg never engaged because any
        in-warmup row made the full-boundary chunk ineligible, leaving the
        pass RTT-bound per-step (0.0 e2e SLO at both QPS points,
        exp/serving_sdxl_bdy1_i6_chunk_v5e_r3r.json)."""
        cc = self.config.cache
        warmup = max(cc.deep_warmup, 0)
        b = len(ordered)
        want = self._deep_state_shape(ordered[0].resolution)
        missing0 = [r.deep_state is None
                    or tuple(r.deep_state.shape) != want for r in ordered]
        age0 = [r.deep_age for r in ordered]
        step0 = [r.sampler_table.step for r in ordered]

        def warm_needs(j, sim_age, sim_missing):
            del sim_age
            return [i for i in range(b)
                    if sim_missing[i] or step0[i] + j < warmup]

        def plan(record):
            sim_age, sim_missing = list(age0), list(missing0)
            max_need = 1
            sel = np.zeros((k, record or 1), np.int32)
            act = np.zeros((k,), np.int32)
            for j in range(k):
                nj = warm_needs(j, sim_age, sim_missing)
                nset = set(nj)
                full = any(sim_age[i] >= itv - 1 for i in range(b)
                           if i not in nset)
                if full:
                    act[j] = 2
                    sim_age = [0] * b
                    sim_missing = [False] * b
                    continue
                if nj:
                    act[j] = 1
                    max_need = max(max_need, len(nj))
                    if record:
                        row = nj + [nj[0]] * (record - len(nj))
                        sel[j] = row[:record]
                for i in range(b):
                    if i in nset:
                        sim_age[i], sim_missing[i] = 0, False
                    else:
                        sim_age[i] += 1
            return sel, act, sim_age, max_need

        _, _, _, max_need = plan(0)
        kb = 1
        while kb < max_need:
            kb *= 2
        if kb >= bb:
            return None
        sel, act, final_age, _ = plan(kb)
        return sel, act, final_age, kb

    def _make_deep_partial_fn(self):
        def fn(params, latents, t, coeffs, guidance, cond, deep, sel):
            noise_pred, c0, c1, deep_out = self._cfg_step(
                latents, t, coeffs, guidance,
                lambda lat_in, t2: self.denoiser_forward(
                    params, lat_in, t2, cond, deep_mode="partial",
                    deep_state=deep, deep_sel=sel))
            return self.sampler.step(latents, noise_pred, c0, c1), deep_out

        return fn

    # -- reuse-then-predict (CacheConfig.deep_predict) --------------------------

    def _deep_predicted(self, r):
        """Deep features a SHALLOW step should feed for request ``r``:
        the last full pass's features, extrapolated ``deep_age + 1`` steps
        along the inter-full velocity when reuse-then-predict is on
        (arXiv 2505.14741 shape; tiny harness: interval-3 divergence
        0.117 -> 0.0034).  A different INPUT to the unchanged shallow
        program — no new step compile keys, just one elementwise op."""
        m = self.config.cache.deep_predict
        if not m or r.deep_slope is None:
            return r.deep_state

        def fn(deep, slope, k):
            return (deep.astype(jnp.float32) + m * k * slope).astype(
                deep.dtype)

        return self._jit(("deep_predict", r.deep_state.shape, m), fn)(
            r.deep_state, r.deep_slope, jnp.float32(r.deep_age + 1))

    def _deep_update_slope(self, r, new) -> None:
        """On a FULL pass: per-step feature velocity (new - old) / gap.
        Layout changes (dense <-> patched flips resize deep_state) reset
        the slope — extrapolating across them would be garbage."""
        if not self.config.cache.deep_predict:
            return
        old = r.deep_state
        if old is None or old.shape != new.shape:
            r.deep_slope = None
            return
        gap = r.deep_age + 1  # shallow steps since last full + this one

        def fn(new, old):
            # stored in the feature dtype: a ~0.4% bf16 quantization on a
            # momentum-damped correction term, for half the HBM (the f32
            # slope would be 42 MB/request at SDXL 1024^2)
            return ((new.astype(jnp.float32) - old.astype(jnp.float32))
                    / gap).astype(new.dtype)

        r.deep_slope = self._jit(("deep_slope", new.shape, gap), fn)(new, old)

    # -- drift-triggered adaptive refresh (CacheConfig.deep_adaptive) ---------

    def _deep_policy(self):
        """(interval cap, warmup, adaptive?) for the deep-reuse decision."""
        cc = self.config.cache
        if cc.deep_adaptive:
            return max(cc.deep_max_interval, 1), cc.deep_warmup, True
        return max(cc.deep_interval, 1), cc.deep_warmup, False

    def _drift_exceeds(self, r) -> bool:
        """True when the freshest COMPLETED drift scalar crosses the
        threshold.  Pending on-device scalars are polled newest-first via
        is_ready() without blocking, so bounded-runahead dispatch is
        preserved; the decision lags the device by at most the in-flight
        bound, and deep_max_interval caps the consequence of a stale read.
        """
        if r.lat_ref is None:
            return True
        pending = r.drift_pending
        for j in range(len(pending) - 1, -1, -1):
            d = pending[j]
            if hasattr(d, "is_ready") and not d.is_ready():
                continue
            r.drift_last = float(d)
            del pending[: j + 1]
            break
        return r.drift_last > self.config.cache.deep_drift_threshold

    def _note_drift(self, r, mode: str, latent) -> None:
        """Post-step adaptive bookkeeping.  A full pass resets the
        reference to the latent the deep features were computed FROM (the
        full step's INPUT — the staleness shallow steps actually
        accumulate; matches the calibration harness, scripts/
        cache_quality.py run_deep_adaptive).  A shallow pass enqueues an
        on-device relative-MSE scalar of its output vs that reference
        (a separate ~µs jit, so every step program keeps its static
        signature and prewarmed compile key)."""
        if mode == "full":
            r.lat_ref = latent
            r.drift_pending.clear()
            r.drift_last = 0.0
        else:
            fn = self._jit(("latent_drift", latent.shape), _latent_drift)
            r.drift_pending.append(fn(latent, r.lat_ref))

    def _make_deep_fn(self, mode: str):
        def fn(params, latents, t, coeffs, guidance, cond, deep):
            noise_pred, c0, c1, deep_out = self._cfg_step(
                latents, t, coeffs, guidance,
                lambda lat_in, t2: self.denoiser_forward(
                    params, lat_in, t2, cond, deep_mode=mode,
                    deep_state=deep))
            return self.sampler.step(latents, noise_pred, c0, c1), deep_out

        return fn

    # -- deep x compact hybrid (CacheConfig.deep_compact_fraction) -------------

    def _hybrid_layout(self, res):
        """Gated-pair layout for the hybrid: only the pairs a SHALLOW step
        runs (models/unet.py shallow_cache_layout)."""
        cells = res // self.vae_scale
        return self.bundle.denoiser.shallow_cache_layout(
            cells, self.config.cache.deep_boundary)

    def _hybrid_sig(self):
        """Composition-store signature for the hybrid row caches: any knob
        that changes the state layout or the gating resets the state."""
        cc = self.config.cache
        return ("hybrid", cc.deep_compact_fraction, cc.deep_boundary)

    def _hybrid_entry_carry(self, res, reqs, bb, sig, mk_state, dtype):
        """Get-or-create the hybrid composition row-state entry WITH row
        carry-over (CacheConfig.deep_row_warmup): a new composition's entry
        is seeded by gathering surviving requests' rows out of the previous
        composition's state instead of resetting to zeros — so an admission
        no longer forces an anchoring batch-wide full.  New requests' rows
        keep the fresh init (hits = max_hits -> forced top-K selection);
        carried incumbents' hits are clamped to max_hits - 1 so ONLY the
        fresh rows carry the forced boost on the next gated step, making
        their selection guaranteed while the fresh-pair count fits the gate
        capacity (the caller anchors with a full otherwise).  Returns
        (entry, fresh_pairs_at_creation)."""
        import collections

        if not hasattr(self, "_comp_state"):
            self._comp_state = collections.OrderedDict()
        kind = "unet_hybrid"
        key = (kind, res, bb, tuple(r.request_id for r in reqs), sig)
        entry = self._comp_state.get(key)
        if entry is not None:
            self._comp_state.move_to_end(key)
            return entry, 0
        parent = None
        for pk in reversed(self._comp_state):
            if pk[0] == kind and pk[1] == res and pk[4] == sig:
                parent = pk
                break
        if parent is None:
            entry = {"state": mk_state(2 * bb), "anchored": False}
            self._comp_state[key] = entry
            self._trim_comp_state()
            return entry, len(reqs)  # every pair fresh: anchor required
        old_ids, old_bb = list(parent[3]), parent[2]
        pos = {rid: i for i, rid in enumerate(old_ids)}
        fresh = [i for i, r in enumerate(reqs) if r.request_id not in pos]
        # CFG-doubled row map [u x bb | c x bb]: new row j <- old row
        # pos[id] (uncond half) / old_bb + pos[id] (cond half); -1 = fresh
        idx = np.full((2 * bb,), -1, np.int64)
        for j, r in enumerate(reqs):
            i = pos.get(r.request_id)
            if i is not None:
                idx[j] = i
                idx[bb + j] = old_bb + i
        parent_entry = self._comp_state.pop(parent)
        # ONE jitted seed with the parent state DONATED: the eager version
        # (~120 relay ops allocating init + gather + where copies next to
        # the retained parent) spiked HBM past budget and stalled serving
        # 13-18 s per composition change (r4d leg-1 schedule log).  Fresh
        # rows get zero state with the forced hits boost; carried rows
        # clamp hits to max-1 so only fresh rows are force-selected next.
        maxh = int(self.config.cache.max_hits)
        seed_key = ("hybrid_carry_seed", res, old_bb, bb, sig)

        def seed_fn(old_state, gather, fresh_rows):
            def leaf(o):
                g = o[gather]
                mask = fresh_rows.reshape((-1,) + (1,) * (g.ndim - 1))
                return jnp.where(mask, jnp.zeros((), g.dtype), g)

            out = {}
            for k, st in old_state.items():
                out[k] = {k2: leaf(v) for k2, v in st.items()}
                out[k]["hits"] = jnp.where(
                    fresh_rows, maxh,
                    jnp.minimum(st["hits"][gather], maxh - 1))
                if "seen" in st:  # predict extras: fresh rows unseen
                    out[k]["seen"] = jnp.where(fresh_rows, False,
                                               st["seen"][gather])
            return out

        state = self._jit(seed_key, seed_fn, donate=(0,))(
            parent_entry["state"], jnp.asarray(np.maximum(idx, 0)),
            jnp.asarray(idx < 0))
        entry = {"state": state,
                 "anchored": parent_entry.get("anchored", False)}
        self._comp_state[key] = entry
        self._trim_comp_state()
        return entry, len(fresh)

    def _trim_comp_state(self):
        lru = max(int(self.config.cache.comp_state_lru), 1)
        while len(self._comp_state) > lru:
            self._comp_state.popitem(last=False)
        budget = float(self.config.cache.comp_state_bytes)
        while (len(self._comp_state) > 1
               and sum(_state_nbytes(e["state"])
                       for e in self._comp_state.values()) > budget):
            self._comp_state.popitem(last=False)

    def _hybrid_state_builder(self, res):
        """(BlockCache, mk_state) for the hybrid row-state entries."""
        from sduss_tpu.cache.manager import BlockCache

        if not hasattr(self, "_cache_obj"):
            self._cache_obj = BlockCache(self.config.cache)
        cache = self._cache_obj
        layout = self._hybrid_layout(res)
        dtype = self._latent_dtype()

        def mk_state(n):
            return {key: cache.init_rows(key, n, s, c_in, c_out, dtype)
                    for key, (s, c_in, c_out) in layout.items()}

        return cache, mk_state

    def _deep_hybrid_call(self, res, reqs, bb, latents, t, coeffs, guidance,
                          cond, mode: str, deep, entry, sel=None, kb=None):
        """One deep-mode step with per-pair compact row gating on shallow/
        partial steps (write-through on full steps).  Threads the
        composition row-cache entry (created by the caller, with carry-over
        under deep_row_warmup): rows are CFG-doubled ([uncond x bb |
        cond x bb], matching _cfg_step's concat order)."""
        b = len(reqs)
        # an un-anchored entry forces mode "full" upstream, whose write-
        # through anchors every gated pair's rows
        assert entry["anchored"] or mode == "full"
        row_valid = np.zeros((bb,), bool)
        row_valid[:b] = True
        # donate the row state (arg 7): ~4 GB at b8 1024^2; without
        # aliasing the full step held old+new copies and OOMed the r2v
        # serving prewarm next to the text-encoder params
        if mode == "partial":
            fn = self._jit(("denoise_deep_hybrid", "partial", res, bb, kb),
                           self._make_deep_hybrid_partial_fn(), donate=(7,))
            new_latents, deep_out, new_state = fn(
                self.params, latents, jnp.asarray(t), jnp.asarray(coeffs),
                jnp.asarray(guidance), cond, deep, entry["state"],
                jnp.asarray(row_valid), jnp.asarray(sel))
        else:
            fn = self._jit(("denoise_deep_hybrid", mode, res, bb),
                           self._make_deep_hybrid_fn(mode), donate=(7,))
            new_latents, deep_out, new_state = fn(
                self.params, latents, jnp.asarray(t), jnp.asarray(coeffs),
                jnp.asarray(guidance), cond, deep, entry["state"],
                jnp.asarray(row_valid))
        entry["state"] = new_state
        if mode == "full":
            entry["anchored"] = True
        return new_latents, deep_out

    def _make_deep_hybrid_partial_fn(self):
        cache = self._cache_obj

        def fn(params, latents, t, coeffs, guidance, cond, deep, cache_state,
               row_valid, sel):
            rv2 = jnp.concatenate([row_valid, row_valid], axis=0)

            def call(lat_in, t2):
                h, deep_out, new_state = self.denoiser_forward(
                    params, lat_in, t2, cond, cache=cache,
                    cache_state=cache_state, deep_mode="partial",
                    deep_state=deep, row_valid=rv2, deep_sel=sel)
                return h, (deep_out, new_state)

            noise_pred, c0, c1, extra = self._cfg_step(
                latents, t, coeffs, guidance, call)
            deep_out, new_state = extra
            return (self.sampler.step(latents, noise_pred, c0, c1),
                    deep_out, new_state)

        return fn

    def _make_deep_hybrid_fn(self, mode: str):
        cache = self._cache_obj

        def fn(params, latents, t, coeffs, guidance, cond, deep, cache_state,
               row_valid):
            rv2 = jnp.concatenate([row_valid, row_valid], axis=0)

            def call(lat_in, t2):
                h, deep_out, new_state = self.denoiser_forward(
                    params, lat_in, t2, cond, cache=cache,
                    cache_state=cache_state, deep_mode=mode, deep_state=deep,
                    row_valid=rv2)
                return h, (deep_out, new_state)

            noise_pred, c0, c1, extra = self._cfg_step(
                latents, t, coeffs, guidance, call)
            deep_out, new_state = extra
            return (self.sampler.step(latents, noise_pred, c0, c1),
                    deep_out, new_state)

        return fn

    def _denoise_fn_stateful(self, params, latents, t, coeffs, guidance, cond, state):
        noise_pred, c0, c1 = self._cfg_forward(params, latents, t, coeffs,
                                               guidance, cond)
        return self.sampler.step_with_state(latents, noise_pred, c0, c1, state)

    def _cfg_step(self, latents, t, coeffs, guidance, model_call):
        """Shared CFG skeleton for the dense-path step builders: duplicate
        -> scale_model_input -> ``model_call(lat_in, t2)`` -> split ->
        guidance combine.  ``model_call`` may return the model output alone
        or (output, extra) — extra (cache state / deep features) passes
        through untouched."""
        lat_in = jnp.concatenate([latents, latents], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c0, c1 = coeffs[:, 0], coeffs[:, 1]
        lat_in = self.sampler.scale_model_input(lat_in, jnp.concatenate([c0, c0]))
        out = model_call(lat_in, t2)
        model_out, extra = out if isinstance(out, tuple) else (out, None)
        uncond, text = jnp.split(model_out, 2, axis=0)
        g = guidance.reshape(-1, *([1] * (latents.ndim - 1)))
        return uncond + g * (text - uncond), c0, c1, extra

    def _cfg_forward(self, params, latents, t, coeffs, guidance, cond):
        noise_pred, c0, c1, _ = self._cfg_step(
            latents, t, coeffs, guidance,
            lambda lat_in, t2: self.denoiser_forward(params, lat_in, t2, cond))
        return noise_pred, c0, c1

    # -- stage 2b: mixed-resolution patch step -------------------------------

    def denoise_step_mixed(self, reqs_by_res: Dict[int, List[Request]],
                           allow_cold: bool = True) -> None:
        """ONE denoiser step over a mixed-resolution patch batch.

        All requests share a single jitted UNet forward: latents are sliced
        into patch_size patches, concatenated patch-major (sorted by
        resolution, reference FCFS_Mixed.py:59-70), and the patch context
        provides halo convs / per-image group norm / grouped attention.

        ``allow_cold=False`` (the serving Worker): a COLD mixed compile key
        must never stall the serving loop (measured: ~150 s per cold key
        through the relay; the r2l mixed pass aborted 10/12 requests on two
        such stalls, exp/serving_sdxl_mixed_v5e_r2.json).  The batch serves
        as dense per-res groups this step (those keys are always warm from
        uniform prewarm) while a daemon thread warms the mixed key on
        throwaway requests; later steps take the patched path.  Direct
        callers (tests, prewarm, offline exactness checks) default to the
        old block-on-compile behavior.
        """
        from sduss_tpu.ops import patching

        self._production_stamp()
        if self.sampler.needs_state and self.config.cache.enabled:
            # Stateful samplers compose with the patch path (state is
            # element-wise; see _sampler_state_to_patches) but not with the
            # block/deep caches' extra_state slot — dense fallback for the
            # rare PNDM+cache combination.
            return self.denoise_step(reqs_by_res)

        ordered: List[Request] = []
        for res in sorted(reqs_by_res):
            ordered.extend(reqs_by_res[res])
        cells = self.config.scheduler.patch_size // self.vae_scale
        sc = self.config.scheduler
        grids = []
        for r in ordered:
            hw = r.latent_hw(self.vae_scale)
            if hw % cells != 0:
                # Resolution not patchable at this patch size: dense fallback.
                return self.denoise_step(reqs_by_res)
            grids.append(hw // cells)
        grids = tuple(grids)

        meta = patching.build_meta(grids, cells, tuple(sc.patch_buckets),
                                   tuple(sc.batch_buckets))
        meta2 = patching.double_meta(grids, cells, tuple(sc.patch_buckets),
                                     tuple(sc.batch_buckets))

        # -- warm-key routing (host-only decision, before any device work)
        stateful = self.sampler.needs_state
        cache = self._block_cache()
        deep_mode = self._deep_mode_mixed(ordered, grids)
        # deep x compact hybrid on the PATCH path: shallow steps gate their
        # pairs image-granularly (unet.apply patch_compact under hybrid);
        # state per composition, anchored by the full step's write-through
        hybrid = (deep_mode is not None
                  and self.config.cache.deep_compact_fraction is not None
                  and hasattr(self.bundle.denoiser, "shallow_cache_layout"))
        hybrid_sig = None
        if hybrid:
            hybrid_sig = (self._hybrid_sig() + ("mixed",)
                          + meta.compile_key + meta2.compile_key)
            if self._comp_state_peek("unet_hybrid_mixed", 0, ordered,
                                     meta.i_pad, hybrid_sig) is None:
                deep_mode = "full"  # anchoring step for fresh row state
        cache_tag = type(cache).__name__ if cache is not None else (
            "deep_hybrid" if hybrid else
            "sampler_state" if stateful else None)
        # BOTH metas' compile keys: the closure bakes in meta AND meta2
        # statics, and compositions can share meta.compile_key while their
        # CFG-DOUBLED metas bucket differently (512:1 and 512:2 both bucket
        # the single class to ipc 2, but double to ipc 2 vs 4 — measured:
        # the colliding retrace crashed the r2n mixed serving pass with a
        # grouped-attention reshape error).
        jit_key = (("denoise_mixed", cache_tag, deep_mode)
                   + meta.compile_key + meta2.compile_key)
        if not allow_cold and jit_key not in self._executed_keys:
            self._queue_mixed_warm(tuple(sorted(
                (res, len(rs)) for res, rs in reqs_by_res.items())))
            return self.denoise_step(reqs_by_res)

        # patch batch (device)
        parts = [patching.split_latent(r.latents, cells) for r in ordered]
        x = jnp.concatenate(parts, axis=0)
        if x.shape[0] < meta.p_pad:
            pad = jnp.zeros((meta.p_pad - x.shape[0],) + x.shape[1:], x.dtype)
            x = jnp.concatenate([x, pad], axis=0)

        # per-image arrays padded to i_pad
        tables = [r.sampler_table for r in ordered]
        i_pad = meta.i_pad

        def pad_i(arr, fill=0.0):
            out = np.full((i_pad,) + arr.shape[1:], fill, arr.dtype)
            out[: arr.shape[0]] = arr
            return out

        t = pad_i(gather_timesteps(tables))
        coeffs = pad_i(gather_coeffs(tables), fill=1.0)
        guidance = pad_i(np.asarray(
            [r.params.guidance_scale if r.params.guidance_scale is not None
             else self.spec.default_guidance for r in ordered], np.float32))
        cond = {}
        for key in ordered[0].conditioning:
            arr = np.concatenate([r.conditioning[key] for r in ordered], axis=0)
            cond[key] = jnp.asarray(pad_i(arr))

        cache, cache_state = self._gather_cache_state(ordered, grids, meta, cells)

        deep_mode, deep_batch = self._gather_deep_mixed(ordered, grids, meta,
                                                        deep_mode)

        from sduss_tpu.ops.patch_ctx import ctx_arrays

        a1, a2 = ctx_arrays(meta), ctx_arrays(meta2)
        # Donate extra_state (arg 8) for the cache-threading variants: the
        # gathered row state / (deep_batch, hybrid rows) tuple is a fresh
        # concat each step and replaced by the call's output, and holding
        # old+new copies of the multi-GB pytree OOMs a 16 GB chip (r2v).
        # The stateful-sampler variant keeps copies (PNDM ets are small).
        donate = (8,) if (hybrid or cache is not None) else ()
        fn = self._jit(jit_key,
                       self._make_mixed_fn(meta, meta2, cache, deep_mode,
                                           stateful=stateful,
                                           hybrid=hybrid), donate=donate)
        if deep_mode is not None and hybrid:
            from sduss_tpu.cache.manager import BlockCache

            if not hasattr(self, "_cache_obj"):
                self._cache_obj = BlockCache(self.config.cache)
            hcache = self._cache_obj
            layout = self.bundle.denoiser.shallow_cache_layout(
                cells, self.config.cache.deep_boundary)
            dtype = self._latent_dtype()

            def mk_state(_n):
                # rows = the DOUBLED patch batch (meta2.p_pad), not 2*bb
                return {key: hcache.init_rows(key, meta2.p_pad, s, ci, co,
                                              dtype)
                        for key, (s, ci, co) in layout.items()}

            entry = self._comp_state_entry("unet_hybrid_mixed", 0, ordered,
                                           meta.i_pad, hybrid_sig, mk_state)
            assert entry["anchored"] or deep_mode == "full"
            new_x, deep_out, new_cstate = fn(
                self.params, x, jnp.asarray(t), jnp.asarray(coeffs),
                jnp.asarray(guidance), cond, a1, a2,
                (deep_batch, entry["state"]))
            entry["state"] = new_cstate
            if deep_mode == "full":
                entry["anchored"] = True
            self._scatter_deep_mixed(ordered, grids, meta, deep_mode, deep_out)
        elif deep_mode is not None:
            new_x, deep_out = fn(self.params, x, jnp.asarray(t), jnp.asarray(coeffs),
                                 jnp.asarray(guidance), cond, a1, a2, deep_batch)
            self._scatter_deep_mixed(ordered, grids, meta, deep_mode, deep_out)
        elif stateful:
            sstate = self._gather_sampler_state_mixed(ordered, grids, cells,
                                                      meta.p_pad)
            new_x, new_sstate = fn(self.params, x, jnp.asarray(t),
                                   jnp.asarray(coeffs), jnp.asarray(guidance),
                                   cond, a1, a2, sstate)
            self._scatter_sampler_state_mixed(ordered, grids, cells, new_sstate)
        elif cache is None:
            new_x = fn(self.params, x, jnp.asarray(t), jnp.asarray(coeffs),
                       jnp.asarray(guidance), cond, a1, a2)
        else:
            new_x, new_state = fn(self.params, x, jnp.asarray(t), jnp.asarray(coeffs),
                                  jnp.asarray(guidance), cond, a1, a2, cache_state)
            self._scatter_cache_state(ordered, grids, meta, new_state)
        # the call above compiled synchronously: the key is warm
        self._executed_keys.add(jit_key)

        # unpack per request
        off = 0
        for r, g in zip(ordered, grids):
            n = g * g
            prev = r.latents
            r.latents = patching.merge_patches(new_x[off : off + n], g)
            off += n
            r.sampler_table.advance()
            r.remain_steps -= 1
            if deep_mode is not None and self.config.cache.deep_adaptive:
                # full: reference = this step's INPUT latent (what the deep
                # features were computed from); shallow: this step's output
                self._note_drift(r, deep_mode,
                                 prev if deep_mode == "full" else r.latents)

    # -- fused multi-step dispatch on the MIXED patch path ---------------------

    def denoise_chunk_mixed(self, reqs_by_res: Dict[int, List[Request]],
                            k: int, allow_cold: bool = True) -> bool:
        """Run ``k`` sampler steps for a MIXED-resolution patch batch inside
        ONE jitted program (the mixed analog of :meth:`denoise_chunk`).

        The mixed compile key is a pure function of the bucketed composition
        (meta/meta2 compile keys), so the chunk simply PINS the composition
        for ``k`` steps: the worker only calls this when the scheduled batch
        is stable for the dispatch, and any composition change between
        dispatches re-gathers exactly like the per-step path (all state is
        per-request or per-composition-entry, shared with the per-step
        programs).  Supported: dense, block/compact cache threading, plain
        deep at fixed interval, and deep x compact hybrid — the serving
        preset (the reference's whole eval is mixed, FCFS_Mixed.py:59-70,
        and per-step mixed serving is relay-RTT-bound: ~145 ms/step
        dispatch tax, exp/serving_sdxl_mixed_preset_v5e_r4c.json).

        Deep chunks start at a step where the per-step path would run a
        batch-wide FULL (mixed deep is batch-wide: _deep_mode_mixed), so
        the in-graph ``j % itv == 0`` schedule reproduces per-step lockstep
        ages; the j=0 full overwrites the whole deep carry, so it seeds as
        zeros and never reads stale rows.  Returns False for ineligible
        configurations (stateful samplers, adaptive/predict deep, warmup
        rows, mid-interval starts, non-patchable resolutions) — the worker
        falls back to per-step dispatch.

        ``allow_cold=False``: a cold chunk key must never stall serving —
        the composition's warm daemon also mints the chunk program
        (_warm_composition), and this step serves per-step meanwhile.
        """
        from sduss_tpu.ops import patching
        from sduss_tpu.ops.patch_ctx import ctx_arrays

        self._production_stamp()
        ordered: List[Request] = []
        for res in sorted(reqs_by_res):
            ordered.extend(reqs_by_res[res])
        if not ordered or k <= 1:
            return False
        if (self.sampler.needs_state
                or any(r.remain_steps < k for r in ordered)
                or getattr(self.config.parallel, "sp_mode", None)
                == "displaced"):
            return False
        cells = self.config.scheduler.patch_size // self.vae_scale
        sc = self.config.scheduler
        grids = []
        for r in ordered:
            hw = r.latent_hw(self.vae_scale)
            if hw % cells != 0:
                return False
            grids.append(hw // cells)
        grids = tuple(grids)
        cc = self.config.cache

        cache = self._block_cache()
        deep_active = self._deep_cache_active()
        mode = "dense"
        hybrid = False
        itv = 1
        need_full = False
        a0 = 0
        if deep_active:
            if (getattr(cc, "deep_adaptive", 0.0)
                    or float(getattr(cc, "deep_predict", 0.0) or 0.0)):
                return False
            interval, warmup, _ = self._deep_policy()
            itv = max(interval, 1)
            if any(r.sampler_table.step < warmup for r in ordered):
                return False
            # ANY-PHASE schedule (the SD3 span-chunk trick): fulls fire
            # in-graph at (j + off) % itv == 0, with ``off`` a TRACED
            # scalar — one program serves every interval phase, so
            # shallow-only chunks fuse too (at interval 24 a boundary-only
            # chunk would fire once per 24 steps).  Requires lockstep ages:
            # either a batch-wide full is due NOW (j=0 full resets everyone
            # — the carry seeds as zeros, never read before overwrite), or
            # every request holds a valid state at the SAME age (the carry
            # seeds from the real gathered states).
            need_full = self._deep_mode_mixed(ordered, grids) == "full"
            if need_full:
                a0 = itv - 1  # schedule-equivalent: expired now
            else:
                ages = {r.deep_age for r in ordered}
                if len(ages) != 1:
                    return False
                a0 = ages.pop()
            hybrid = (cc.deep_compact_fraction is not None
                      and hasattr(self.bundle.denoiser,
                                  "shallow_cache_layout"))
            mode = "hybrid" if hybrid else "deep"
        elif cache is not None:
            mode = "cached"
        elif cc.enabled:
            return False  # cache config this path can't thread in-graph

        meta = patching.build_meta(grids, cells, tuple(sc.patch_buckets),
                                   tuple(sc.batch_buckets))
        meta2 = patching.double_meta(grids, cells, tuple(sc.patch_buckets),
                                     tuple(sc.batch_buckets))
        jit_key = (("mixed_chunk", mode, k)
                   + meta.compile_key + meta2.compile_key)
        if not allow_cold and jit_key not in self._executed_keys:
            self._queue_mixed_warm(tuple(sorted(
                (res, len(rs)) for res, rs in reqs_by_res.items())))
            return False

        hybrid_sig = None
        entry = None
        if hybrid:
            hybrid_sig = (self._hybrid_sig() + ("mixed",)
                          + meta.compile_key + meta2.compile_key)
            # PEEK before create: materializing an un-anchored entry and
            # then refusing would make the per-step path's peek-is-not-None
            # shortcut skip its anchoring full and trip its anchored assert
            peeked = self._comp_state_peek("unet_hybrid_mixed", 0, ordered,
                                           meta.i_pad, hybrid_sig)
            if not need_full and (peeked is None or not peeked["anchored"]):
                # fresh row state with no full in sight: the per-step path
                # runs the anchoring full first (peek-is-None forces it)
                return False
            from sduss_tpu.cache.manager import BlockCache

            if not hasattr(self, "_cache_obj"):
                self._cache_obj = BlockCache(cc)
            hcache = self._cache_obj
            layout = self.bundle.denoiser.shallow_cache_layout(
                cells, cc.deep_boundary)
            dtype = self._latent_dtype()

            def mk_state(_n):
                # rows = the CFG-DOUBLED patch batch (meta2.p_pad)
                return {key: hcache.init_rows(key, meta2.p_pad, s, ci, co,
                                              dtype)
                        for key, (s, ci, co) in layout.items()}

            entry = self._comp_state_entry("unet_hybrid_mixed", 0, ordered,
                                           meta.i_pad, hybrid_sig, mk_state)

        # -- batch gathers (once per chunk, identical to the per-step path)
        parts = [patching.split_latent(r.latents, cells) for r in ordered]
        x = jnp.concatenate(parts, axis=0)
        if x.shape[0] < meta.p_pad:
            pad = jnp.zeros((meta.p_pad - x.shape[0],) + x.shape[1:], x.dtype)
            x = jnp.concatenate([x, pad], axis=0)
        i_pad = meta.i_pad
        ts = np.zeros((k, i_pad), np.float32)
        cs = np.ones((k, i_pad, 2), np.float32)
        for i, r in enumerate(ordered):
            tbl = r.sampler_table
            s0 = tbl.step
            ts[:, i] = tbl.timesteps[s0 : s0 + k]
            cs[:, i] = tbl.coeffs[s0 : s0 + k]
        guidance = np.zeros((i_pad,), np.float32)
        guidance[: len(ordered)] = [
            r.params.guidance_scale if r.params.guidance_scale is not None
            else self.spec.default_guidance for r in ordered]
        cond = {}
        for key in ordered[0].conditioning:
            arr = np.concatenate([r.conditioning[key] for r in ordered],
                                 axis=0)
            pad = np.zeros((i_pad - arr.shape[0],) + arr.shape[1:], arr.dtype)
            cond[key] = jnp.asarray(np.concatenate([arr, pad], axis=0))
        a1, a2 = ctx_arrays(meta), ctx_arrays(meta2)

        args = [self.params, x, jnp.asarray(ts), jnp.asarray(cs),
                jnp.asarray(guidance), cond, a1, a2]
        donate = ()
        if mode in ("deep", "hybrid"):
            if need_full:
                # zero carry: j=0 runs full and overwrites every row before
                # any read; the row SHAPE comes from a cached eval_shape of
                # the full program (patch rows are uniform across
                # resolutions)
                dp0 = self._mixed_chunk_deep_zeros(meta, meta2, hybrid,
                                                   args, entry)
            else:
                _, dp0 = self._gather_deep_mixed(ordered, grids, meta,
                                                 "shallow")
            args.append(dp0)
            if hybrid:
                donate = (len(args),)  # entry state: multi-GB at full size
                args.append(entry["state"])
            # fulls at (j + off) % itv == 0; off = (a0 + 1) mod itv makes
            # j=0 full exactly when the per-step path would run one
            args += [jnp.int32(itv), jnp.int32((a0 + 1) % itv)]
        elif mode == "cached":
            _, cache_state = self._gather_cache_state(ordered, grids, meta,
                                                      cells)
            donate = (len(args),)
            args.append(cache_state)

        fn = self._jit(jit_key,
                       self._make_mixed_chunk_fn(meta, meta2, mode, k,
                                                 cache=cache),
                       donate=donate)
        out = fn(*args)
        self._executed_keys.add(jit_key)
        new_x = out[0]
        if mode in ("deep", "hybrid"):
            deep_out = out[1]
            # host mirror of the in-graph schedule: final lockstep age
            fulls = [j for j in range(k) if (j + a0 + 1) % itv == 0]
            final_age = (k - 1 - fulls[-1]) if fulls else a0 + k
            if hybrid and fulls:
                entry["state"] = out[2]
                entry["anchored"] = True
            elif hybrid:
                entry["state"] = out[2]
        elif mode == "cached":
            self._scatter_cache_state(ordered, grids, meta, out[1])

        pos = 0
        for r, g in zip(ordered, grids):
            n = g * g
            r.latents = patching.merge_patches(new_x[pos : pos + n], g)
            if mode in ("deep", "hybrid"):
                u = deep_out[pos : pos + n]
                c = deep_out[meta.p_pad + pos : meta.p_pad + pos + n]
                r.deep_state = jnp.concatenate([u, c], axis=0)
                r.deep_age = final_age
                r.deep_slope = None
            pos += n
            for _ in range(k):
                r.sampler_table.advance()
            r.remain_steps -= k
        return True

    def _mixed_chunk_deep_zeros(self, meta, meta2, hybrid: bool, args,
                                entry):
        """Zero deep-carry batch for the mixed chunk, shaped by a CACHED
        eval_shape of the full-mode mixed program (tracing only — no
        compile, no device work; ~seconds once per composition bucket)."""
        import jax

        if not hasattr(self, "_mixed_chunk_dp"):
            self._mixed_chunk_dp = {}
        key = (meta.compile_key + meta2.compile_key
               + (hybrid, self.config.cache.deep_boundary))
        got = self._mixed_chunk_dp.get(key)
        if got is None:
            full_f = self._make_mixed_fn(meta, meta2, deep_mode="full",
                                         hybrid=hybrid)
            extra = (None, entry["state"]) if hybrid else None
            shapes = jax.eval_shape(
                lambda p, xx, tt, co, gg, cd, A1, A2: full_f(
                    p, xx, tt, co, gg, cd, A1, A2, extra),
                args[0], args[1], args[2][0], args[3][0], args[4], args[5],
                args[6], args[7])
            got = (shapes[1].shape, shapes[1].dtype)
            self._mixed_chunk_dp[key] = got
        return jnp.zeros(got[0], got[1])

    def _make_mixed_chunk_fn(self, meta, meta2, mode: str, k: int,
                             cache=None):
        """Traced k-step loop over the SAME per-step mixed builders
        (_make_mixed_fn); deep modes select full/shallow in-graph by
        ``j % itv == 0``, so the program contains each body once."""
        import jax

        if mode == "hybrid":
            full_f = self._make_mixed_fn(meta, meta2, deep_mode="full",
                                         hybrid=True)
            sh_f = self._make_mixed_fn(meta, meta2, deep_mode="shallow",
                                       hybrid=True)

            def fn(params, x, ts, cs, guidance, cond, a1, a2, dp0, st0,
                   itv, off):
                def body(j, carry):
                    return jax.lax.cond(
                        (j + off) % itv == 0,
                        lambda a: full_f(params, a[1], ts[a[0]], cs[a[0]],
                                         guidance, cond, a1, a2,
                                         (a[2], a[3])),
                        lambda a: sh_f(params, a[1], ts[a[0]], cs[a[0]],
                                       guidance, cond, a1, a2,
                                       (a[2], a[3])),
                        (j, carry[0], carry[1], carry[2]))

                return jax.lax.fori_loop(0, k, body, (x, dp0, st0))

            return fn
        if mode == "deep":
            full_f = self._make_mixed_fn(meta, meta2, deep_mode="full")
            sh_f = self._make_mixed_fn(meta, meta2, deep_mode="shallow")

            def fn(params, x, ts, cs, guidance, cond, a1, a2, dp0, itv,
                   off):
                def body(j, carry):
                    return jax.lax.cond(
                        (j + off) % itv == 0,
                        lambda a: full_f(params, a[1], ts[a[0]], cs[a[0]],
                                         guidance, cond, a1, a2, a[2]),
                        lambda a: sh_f(params, a[1], ts[a[0]], cs[a[0]],
                                       guidance, cond, a1, a2, a[2]),
                        (j, carry[0], carry[1]))

                return jax.lax.fori_loop(0, k, body, (x, dp0))

            return fn
        if mode == "cached":
            step_f = self._make_mixed_fn(meta, meta2, cache=cache)

            def fn(params, x, ts, cs, guidance, cond, a1, a2, st0):
                def body(j, carry):
                    return step_f(params, carry[0], ts[j], cs[j], guidance,
                                  cond, a1, a2, carry[1])

                return jax.lax.fori_loop(0, k, body, (x, st0))

            return fn

        step_f = self._make_mixed_fn(meta, meta2)

        def fn(params, x, ts, cs, guidance, cond, a1, a2):
            def body(j, x):
                return step_f(params, x, ts[j], cs[j], guidance, cond,
                              a1, a2)

            return (jax.lax.fori_loop(0, k, body, x),)

        return fn

    # -- background mixed-key warming (warm-key routing) -----------------------

    def _queue_mixed_warm(self, comp) -> None:
        """Warm a mixed composition's step programs in a daemon thread.

        ``comp``: sorted ((res, count), ...).  JAX jit dispatch and XLA
        compilation are thread-safe; the warm drive uses THROWAWAY requests,
        so the only shared mutable state is the _fns dict (GIL-atomic) and
        _executed_keys.  The serving loop keeps serving the mix dense until
        the key lands.
        """
        with self._mixed_warm_lock:
            if comp in self._mixed_warm_pending:
                return
            self._mixed_warm_pending.add(comp)
            if (self._mixed_warm_thread is None
                    or not self._mixed_warm_thread.is_alive()):
                self._mixed_warm_thread = threading.Thread(
                    target=self._mixed_warm_loop, daemon=True,
                    name="mixed-key-warm")
                self._mixed_warm_thread.start()

    def _mixed_warm_loop(self) -> None:
        done: set = set()
        while True:
            with self._mixed_warm_lock:
                todo = next((c for c in self._mixed_warm_pending
                             if c not in done), None)
                if todo is None:
                    self._mixed_warm_thread = None
                    return
            try:
                self._warm_composition(todo)
                logger.info("mixed warm: composition %s ready", dict(todo))
            except Exception:  # never kill serving over a warm failure
                logger.exception("mixed warm failed for %s", dict(todo))
            done.add(todo)

    def _warm_composition(self, comp) -> None:
        """Drive enough mixed steps on throwaway requests to mint every
        program variant the production loop will ask for (full + shallow
        under the deep cache; the single cached/plain program otherwise)."""
        from sduss_tpu.request import SamplingParams, Stage

        cc = self.config.cache
        steps = 2
        if cc.enabled and cc.mode == "deep":
            interval = max(cc.deep_max_interval if cc.deep_adaptive
                           else cc.deep_interval, 1)
            steps = cc.deep_warmup + interval + 1
        chunk_k = max(self.config.scheduler.steps_per_dispatch, 1)
        itv = max(cc.deep_interval, 1) if (cc.enabled and cc.mode == "deep") \
            else 1
        reqs_by_res: Dict[int, List[Request]] = {}
        flat: List[Request] = []
        for res, count in comp:
            rs = [Request(f"mixwarm-{res}-{i}", SamplingParams(
                      prompt="", resolution=res,
                      num_inference_steps=steps + itv + chunk_k + 2, seed=0))
                  for i in range(count)]
            reqs_by_res[res] = rs
            flat.extend(rs)
        # Defer to production before EVERY device-touching warm op: the
        # throwaway steps run full-size on the serving device, and an
        # unthrottled warm drive at load collapses serving (r5b mixed
        # qps-1.1, machine SLO 0.0).  Dense serving is the designed
        # fallback while the composition waits.
        self._warm_wait_idle()
        self.prepare(flat)
        for r in flat:
            r.stage = Stage.DENOISING
        for _ in range(steps):
            for r in flat:
                # quiet the adaptive drift trigger PER REQUEST (random
                # activations drift wildly; a shared-config pin like
                # Engine.prewarm's would corrupt concurrent production)
                r.drift_pending.clear()
                r.drift_last = 0.0
            self._warm_wait_idle()
            self.denoise_step_mixed(reqs_by_res, allow_cold=True)
        if chunk_k > 1:
            # also mint the composition's fused-chunk program (the worker
            # prefers it; a cold chunk key would otherwise fall back to
            # per-step forever on this composition).  Deep chunks need a
            # full-boundary start — walk per-step up to one interval to
            # reach one (denoise_chunk_mixed returns False off-boundary).
            for _ in range(itv + 1):
                for r in flat:
                    r.drift_pending.clear()
                    r.drift_last = 0.0
                self._warm_wait_idle()
                if self.denoise_chunk_mixed(reqs_by_res, chunk_k,
                                            allow_cold=True):
                    break
                self.denoise_step_mixed(reqs_by_res, allow_cold=True)

    # -- stateful sampler state on the patch path ------------------------------

    @staticmethod
    def _sampler_state_to_patches(leaf, g: int, cells: int):
        """(1, *L, h, w, C) -> (g*g, *L, s, s, C); per-request scalars
        broadcast per patch.

        Stateful sampler updates (PNDM eps history / corrector base /
        counter, samplers/pndm.py step_with_state) are ELEMENT-WISE in the
        latent with per-request scalars, so slicing the state exactly like
        the latents makes the patched step bit-identical to the dense
        per-request step (every patch of a request sees the same count and
        coefficients; the reference's batch PNDM relies on the same
        property, scheduling_pndm.py batch_step)."""
        from sduss_tpu.ops import patching

        if leaf.ndim >= 4:
            lead = leaf.shape[1:-3]
            parts = [
                patching.split_latent(flat[None], cells)
                for flat in leaf.reshape((-1,) + leaf.shape[-3:])]
            stacked = jnp.stack(parts, axis=1)  # (n, K, s, s, C)
            return stacked.reshape((stacked.shape[0],) + lead
                                   + stacked.shape[-3:])
        return jnp.broadcast_to(leaf, (g * g,) + leaf.shape[1:])

    @staticmethod
    def _sampler_state_from_patches(leaf, g: int, cells: int):
        """Inverse of _sampler_state_to_patches (scalars take patch 0)."""
        from sduss_tpu.ops import patching

        if leaf.ndim >= 4:
            lead = leaf.shape[1:-3]
            n = g * g
            flat = leaf.reshape((n, -1) + leaf.shape[-3:])
            merged = jnp.stack(
                [patching.merge_patches(flat[:, k], g)[0]
                 for k in range(flat.shape[1])])  # (K, h, w, C)
            return merged.reshape((1,) + lead + merged.shape[-3:])
        return leaf[:1]

    def _gather_sampler_state_mixed(self, ordered, grids, cells, p_pad):
        """Per-request dense sampler state -> one patch-major batch tree.

        The request's canonical state stays DENSE (the dense path's layout),
        so a request freely flips dense<->patched between steps; the slice
        is a reshape/transpose XLA fuses into the step."""
        for r in ordered:
            if r.sampler_state is None:
                r.sampler_state = self.sampler.init_state(r.latents)
        per_req = [
            jax.tree.map(
                lambda a, g=g: self._sampler_state_to_patches(a, g, cells),
                r.sampler_state)
            for r, g in zip(ordered, grids)]
        batched = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                               *per_req)
        pad = p_pad - sum(g * g for g in grids)
        if pad:
            batched = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0),
                batched)
        return batched

    def _scatter_sampler_state_mixed(self, ordered, grids, cells, new_state):
        off = 0
        for r, g in zip(ordered, grids):
            n = g * g
            sub = jax.tree.map(lambda a: a[off : off + n], new_state)
            r.sampler_state = jax.tree.map(
                lambda a: self._sampler_state_from_patches(a, g, cells), sub)
            off += n

    # -- block cache state plumbing -------------------------------------------

    def _block_cache(self):
        """Cache object for the mixed patch path.

        Mode "block" gates the patch path with the masked-recompute splice
        (exact reference semantics, no compute saving); mode "compact" adds
        real savings via gate_compact_images — whole drift-ranked images
        gathered per resolution class into a static canonical
        sub-composition, where the pair recomputes exactly
        (cache/manager.py).  Lazily built when enabled and the denoiser
        supports it.
        """
        if not self.config.cache.enabled \
                or self.config.cache.mode not in ("block", "compact"):
            return None
        if not hasattr(self.bundle.denoiser, "cache_layout"):
            return None
        if not hasattr(self, "_cache_obj"):
            from sduss_tpu.cache.manager import BlockCache

            self._cache_obj = BlockCache(self.config.cache)
        return self._cache_obj

    def _gather_cache_state(self, ordered, grids, meta, cells):
        """Concatenate per-request cache rows into the CFG-doubled batch state.

        Batch layout is [uncond patches | pad | cond patches | pad]; each
        request keeps rows of leading dim 2*n (its uncond rows then its cond
        rows), so membership changes between steps re-stitch exactly
        (reference misalignment risk designed out; SURVEY.md section 7 step 6).
        """
        cache = self._block_cache()
        if cache is None:
            return None, None
        layout = self.bundle.denoiser.cache_layout(cells, self.config.cache.min_level)
        dtype = self._latent_dtype()
        first = next(iter(layout))
        for r, g in zip(ordered, grids):
            rows = r.cache_rows
            # a request may flip between the dense-compact and patched paths
            # across steps; a layout mismatch forces re-init
            stale = (rows is None or first not in rows
                     or rows[first]["inp"].shape[0] != 2 * g * g
                     or isinstance(rows[first]["out"], dict)
                     or "mid1" in rows[first])  # legacy conv-compact rows
            if stale:
                r.cache_rows = {
                    key: cache.init_rows(key, 2 * g * g, s, c_in, c_out, dtype)
                    for key, (s, c_in, c_out) in layout.items()}
        state = {}
        pad_rows = meta.p_pad - sum(g * g for g in grids)
        for key, (s, c_in, c_out) in layout.items():
            halves = {0: [], 1: []}
            for r, g in zip(ordered, grids):
                n = g * g
                rows = r.cache_rows[key]
                halves[0].append(jax.tree.map(lambda a: a[:n], rows))
                halves[1].append(jax.tree.map(lambda a: a[n:], rows))
            if pad_rows:
                pad = cache.init_rows(key, pad_rows, s, c_in, c_out, dtype)
                halves[0].append(pad)
                halves[1].append(pad)
            parts = halves[0] + halves[1]
            state[key] = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        return cache, state

    def _deep_mode_mixed(self, ordered, grids) -> Optional[str]:
        """Host-only full/shallow decision for the mixed path (no device
        work — also drives warm-key routing, which must know the jit key
        BEFORE any batch gathering)."""
        if not self._deep_cache_active():
            return None
        interval, warmup, adaptive = self._deep_policy()
        # a request may flip between the dense and patched paths across steps
        # (batch composition changes); a layout mismatch forces a full pass
        need_full = any(
            r.deep_state is None or r.deep_age >= interval - 1
            or r.sampler_table.step < warmup
            or r.deep_state.shape[0] != 2 * g * g
            or (adaptive and self._drift_exceeds(r))
            for r, g in zip(ordered, grids))
        return "full" if need_full else "shallow"

    def _gather_deep_mixed(self, ordered, grids, meta, mode: Optional[str]):
        """Mixed-path deep reuse: per-request deep-feature rows -> CFG-doubled
        batch ([uncond | pad | cond | pad], like the cache rows)."""
        if mode != "shallow":
            return mode, None
        pad_rows = meta.p_pad - sum(g * g for g in grids)
        halves = {0: [], 1: []}
        for r, g in zip(ordered, grids):
            n = g * g
            dp = self._deep_predicted(r)
            halves[0].append(dp[:n])
            halves[1].append(dp[n:])
        if pad_rows:
            z = jnp.zeros((pad_rows,) + halves[0][0].shape[1:],
                          halves[0][0].dtype)
            halves[0].append(z)
            halves[1].append(z)
        return "shallow", jnp.concatenate(halves[0] + halves[1], axis=0)

    def _scatter_deep_mixed(self, ordered, grids, meta, deep_mode, deep_out) -> None:
        off = 0
        for r, g in zip(ordered, grids):
            n = g * g
            if deep_mode == "full":
                u = deep_out[off : off + n]
                c = deep_out[meta.p_pad + off : meta.p_pad + off + n]
                new = jnp.concatenate([u, c], axis=0)
                self._deep_update_slope(r, new)
                r.deep_state = new
                r.deep_age = 0
            else:
                r.deep_age += 1
            off += n

    def _scatter_cache_state(self, ordered, grids, meta, new_state) -> None:
        for key, entry in new_state.items():
            off = 0
            for r, g in zip(ordered, grids):
                n = g * g
                u = jax.tree.map(lambda a: a[off : off + n], entry)
                c = jax.tree.map(
                    lambda a: a[meta.p_pad + off : meta.p_pad + off + n], entry)
                r.cache_rows[key] = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], axis=0), u, c)
                off += n

    def _make_mixed_fn(self, meta, meta2, cache=None, deep_mode=None,
                       stateful=False, hybrid=False):
        from sduss_tpu.ops.patch_ctx import PatchContext

        if hybrid and not hasattr(self, "_cache_obj"):
            from sduss_tpu.cache.manager import BlockCache

            self._cache_obj = BlockCache(self.config.cache)

        def fn(params, x, t, coeffs, guidance, cond, ctx1_arrays, ctx2_arrays,
               extra_state=None):
            # Index tensors arrive as traced args: one compiled fn serves all
            # compositions sharing this bucket key (meta.compile_key).
            ctx1 = PatchContext(meta, arrays=ctx1_arrays)
            ctx2 = PatchContext(meta2, arrays=ctx2_arrays)
            c0, c1 = coeffs[:, 0], coeffs[:, 1]  # per image (i_pad,)
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            c0_patch2 = jnp.concatenate([c0, c0])[ctx2.image_id]
            x2 = self.sampler.scale_model_input(x2, c0_patch2)
            new_state = None
            new_cstate = None
            if deep_mode is not None and hybrid:
                deep_st, cache_st = extra_state
                model_out, new_state, new_cstate = self.denoiser_forward(
                    params, x2, t2, cond, ctx=ctx2, cache=self._cache_obj,
                    cache_state=cache_st, deep_mode=deep_mode,
                    deep_state=deep_st)
            elif deep_mode is not None:
                model_out, new_state = self.denoiser_forward(
                    params, x2, t2, cond, ctx=ctx2, deep_mode=deep_mode,
                    deep_state=extra_state)
            elif cache is not None:
                model_out, new_state = self.denoiser_forward(
                    params, x2, t2, cond, ctx=ctx2, cache=cache,
                    cache_state=extra_state)
            else:
                model_out = self.denoiser_forward(params, x2, t2, cond, ctx=ctx2)
            uncond, text = jnp.split(model_out, 2, axis=0)
            g = guidance[ctx1.image_id].reshape(-1, 1, 1, 1)
            noise_pred = uncond + g * (text - uncond)
            c0p = c0[ctx1.image_id]
            c1p = c1[ctx1.image_id]
            if stateful:
                # extra_state is the patch-sliced sampler state; the update
                # is element-wise, so per-patch application is exact.
                return self.sampler.step_with_state(x, noise_pred, c0p, c1p,
                                                    extra_state)
            stepped = self.sampler.step(x, noise_pred, c0p, c1p)
            if deep_mode is not None and hybrid:
                return stepped, new_state, new_cstate
            if cache is not None or deep_mode is not None:
                return stepped, new_state
            return stepped

        return fn

    # -- stage 3: postprocess ------------------------------------------------

    def postprocess(self, reqs_by_res: Dict[int, List[Request]]) -> None:
        # These requests' composition-state entries are dead (keys embed
        # the exact request-id tuple) — drop them BEFORE the decode, which
        # is the pipeline's HBM peak (the r2y serving OOM).
        self.evict_finished_state(
            {r.request_id for reqs in reqs_by_res.values() for r in reqs})
        for res in sorted(reqs_by_res):
            all_reqs = reqs_by_res[res]
            # latent output type skips the VAE decode entirely
            for r in all_reqs:
                if r.params.output_type == "latent":
                    r.output = np.asarray(r.latents[0], np.float32)
            reqs = [r for r in all_reqs if r.params.output_type != "latent"]
            # chunk: full-res decode activations are the pipeline's HBM peak
            chunk = max(self.config.scheduler.decode_batch, 1)
            tile = self.config.model.vae_tile_latent
            if tile and res // self.vae_scale > tile:
                # Tiled decode is active because even ONE image's decode
                # presses the HBM ceiling (SD3 16-ch VAE); batching tiles
                # multiplies the per-tile live set and OOMs a 16 GB v5e at
                # b2 (measured, r2l serving prewarm) — decode one at a time.
                chunk = 1
            chunk = min(chunk, self._decode_capacity_chunk(res))
            for i in range(0, len(reqs), chunk):
                self._decode_group(res, reqs[i : i + chunk])

    def post_overlap_ok(self, reqs_by_res) -> bool:
        """May this postprocess run on the background thread while the
        serving loop keeps denoising?

        Async overlap adds the decode transient NEXT TO a live denoise
        step's workspace and any composition-state churn transient (carry
        seeds) — live sets that never coexist under synchronous post.
        Measured failure (r5b scale-128): a b8 1024^2 hybrid pass died
        RESOURCE_EXHAUSTED in a denoise step while an async decode group
        was in flight.  Overlap is allowed only when params + live state
        + one decode group + the step-workspace margin fit the HBM
        budget; otherwise the worker decodes synchronously (the decode
        blocks the loop — the pre-overlap behavior)."""
        try:
            ec = self.config.engine
            ms = jax.local_devices()[0].memory_stats() or {}
            lim = float(ms.get("bytes_limit") or ec.hbm_bytes_fallback)
            live = sum(
                _state_nbytes(e.get("state")) + _state_nbytes(e.get("kv"))
                for attr in ("_comp_state", "_sd3_state", "_disp_state")
                for e in list((getattr(self, attr, None) or {}).values()))
            need = 0.0
            for res, reqs in reqs_by_res.items():
                chunk = min(max(self.config.scheduler.decode_batch, 1),
                            max(len(reqs), 1))
                per_img = float(ec.decode_bytes_per_pixel) * res * res
                need = max(need, per_img * chunk)
            head = (lim - self.device_param_bytes() - live
                    - float(ec.prewarm_hbm_margin)
                    - float(ec.decode_hbm_margin))
            return head >= need
        except Exception:  # noqa: BLE001 — no estimate => stay safe, sync
            return False

    def _decode_capacity_chunk(self, res: int) -> int:
        """Largest decode group that fits next to params + LIVE composition
        state.  Unlike prewarm (state released before its decode), serving
        decodes while OTHER compositions' cache/KV state stays resident;
        the decode transient (~decode_bytes_per_pixel x res^2 per image,
        dominated by the decoder's full-res feature maps) must fit the
        remaining headroom or the fetch dies RESOURCE_EXHAUSTED — which on
        the axon relay can poison the device (r2w lesson)."""
        try:
            import jax

            ec = self.config.engine
            ms = jax.local_devices()[0].memory_stats() or {}
            lim = float(ms.get("bytes_limit") or ec.hbm_bytes_fallback)
            live = sum(
                _state_nbytes(e.get("state")) + _state_nbytes(e.get("kv"))
                for attr in ("_comp_state", "_sd3_state", "_disp_state")
                for e in list((getattr(self, attr, None) or {}).values()))
            head = lim - self.device_param_bytes() - live \
                - float(ec.decode_hbm_margin)
            per_img = float(ec.decode_bytes_per_pixel) * res * res
            return max(1, int(head // per_img)) if per_img > 0 else 1
        except Exception:  # noqa: BLE001
            return max(self.config.scheduler.decode_batch, 1)

    def _decode_group(self, res: int, reqs: List[Request]) -> None:
        if not reqs:
            return
        b = len(reqs)
        bb = bucket_for(b, self.config.scheduler.batch_buckets)
        latents = jnp.concatenate([r.latents for r in reqs], axis=0)
        if bb != b:
            latents = jnp.concatenate(
                [latents, jnp.repeat(latents[-1:], bb - b, axis=0)], axis=0)
        fn = self._jit(("decode", res, bb), self._decode_fn)
        images = np.asarray(fn(self.params, latents))
        checker = self._safety_checker()
        if checker is not None:
            images, flags = checker.check(images[:b])
            for req, flagged in zip(reqs, flags):
                req.nsfw_flagged = flagged
        for i, req in enumerate(reqs):
            req.output = images[i]

    def _safety_checker(self):
        """Lazy safety checker (reference vendors the stock SD checker,
        pipelines/stable_diffusion/safety_checker.py)."""
        path = self.config.model.safety_checker_path
        if not path:
            return None
        if not hasattr(self, "_safety_obj"):
            from sduss_tpu.models.safety_checker import SafetyChecker

            checker = SafetyChecker(tiny=self.config.model.test_tiny)
            if path == "random":
                checker.init_random(seed=self.config.model.seed)
            else:
                checker.load(path)
            self._safety_obj = checker
        return self._safety_obj

    def _vae_dtype(self):
        mode = self.config.model.vae_dtype
        if mode == "bfloat16":
            return jnp.bfloat16
        if mode == "float32":
            return jnp.float32
        # auto: bf16 on TPU (fp32 lacks a fast MXU path; measured 542ms ->
        # ~140ms for the 1024^2 decode), exact f32 elsewhere (CPU tests).
        return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def _decode_fn(self, params, latents):
        dtype = self._vae_dtype()
        vae = self.bundle.models["vae"]
        tile = self.config.model.vae_tile_latent
        if tile and latents.shape[1] > tile:
            # HBM-bounded tiled decode (SD3 16-ch full-res peak; vae.py).
            def decode(p, z, dtype=None):
                return vae.decode_tiled(
                    p, z, dtype=dtype, tile=tile,
                    overlap=self.config.model.vae_tile_overlap)
        else:
            decode = vae.decode
        vae_params = params["vae"]
        if dtype == jnp.bfloat16:
            vae_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                vae_params)
            img = decode(vae_params, latents.astype(jnp.float32),
                         dtype=jnp.bfloat16)
        else:
            # float32 math at "high" precision (bf16_3x passes: ~f32-accurate,
            # ~2x the speed of "highest"/f32-native)
            with jax.default_matmul_precision("high"):
                img = decode(vae_params, latents.astype(jnp.float32))
        img = jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    # -- helpers -------------------------------------------------------------

    def _encode_buckets(self):
        """Bucket ladder for ENCODER batches: the denoiser ladder plus one
        doubled bucket.  SD3's one-pass pos+neg encode (sd3.py
        encode_conditioning) runs 2x the request batch through the
        encoders, so a full bucket's prompts legitimately exceed
        batch_buckets[-1] (r2v: prewarm batch 4 vs buckets (1,2) crashed
        bucket_for).  Prewarm covers every request bucket b, so every
        2b key this ladder can mint gets warmed."""
        bks = list(self.config.scheduler.batch_buckets)
        return bks + [2 * bks[-1]]

    def _encode_clip(self, role: str, ids: np.ndarray, *, penultimate: bool,
                     need_pooled: bool):
        """Jitted CLIP encode returning (features, pooled_or_None)."""
        model = self.bundle.models[role]
        bb = bucket_for(ids.shape[0], self._encode_buckets())
        ids = _pad_batch(ids, bb)

        def fn(params, ids):
            out = model.apply(params[role], ids, output_hidden_states=penultimate)
            feats = out["hidden_states"][-2] if penultimate else out["last_hidden_state"]
            return feats, out["pooled"]

        ep = self.encoder_params(role)
        if self.config.model.encoders_on_host:
            # place the numpy ids straight on the host backend —
            # jnp.asarray first would upload through the relay and download
            # right back (2 wasted round trips per encode)
            ids_a = jax.device_put(ids, jax.devices("cpu")[0])
        else:
            ids_a = jnp.asarray(ids)
        feats, pooled = self._jit(("clip", role, bb, penultimate), fn)(ep, ids_a)
        return np.asarray(feats), (np.asarray(pooled) if need_pooled else None)
