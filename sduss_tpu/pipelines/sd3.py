"""SD-3.5 pipeline: triple text encoding (CLIP-L + CLIP-G + T5), flow matching.

Reference: pipeline_stable_diffusion_3_esymred.py (three encoders,
PatchSD3Transformer wrap :30-36, flow-match sampler).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List

import numpy as np

from sduss_tpu.config import bucket_for
from sduss_tpu.pipelines.base import BasePipeline, _pad_batch


class StableDiffusion3Pipeline(BasePipeline):
    FAMILY = "sd3"

    T5_SEQ_LEN = 256

    # T5-XXL is the prepare-stage cost (host encode ~10 s/row batch on the
    # relay VM's cores); serving traffic repeats rows constantly — every CFG
    # request re-encodes the SAME negative prompt (usually "").  Bound: 32
    # rows x 256 x 4096 f16 = 64 MB host RAM.
    T5_CACHE_ROWS = 32

    def _encode_t5(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        if not hasattr(self, "_t5_row_cache"):
            self._t5_row_cache: "OrderedDict[bytes, np.ndarray]" = OrderedDict()
        cache = self._t5_row_cache
        keys = [ids[i].tobytes() + mask[i].tobytes()
                for i in range(ids.shape[0])]
        miss = sorted({i for i, k in enumerate(keys) if k not in cache})
        if miss:
            fresh = self._encode_t5_rows(ids[miss], mask[miss])
            for j, i in enumerate(miss):
                cache[keys[i]] = fresh[j].astype(np.float16)
                while len(cache) > self.T5_CACHE_ROWS:
                    cache.popitem(last=False)
        out = np.stack([cache[k] for k in keys]).astype(np.float32)
        for k in keys:  # LRU touch
            cache.move_to_end(k)
        return out

    def _encode_t5_rows(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        model = self.bundle.models["text_encoder_3"]
        n = ids.shape[0]
        # encoder ladder: one-pass pos+neg encode can reach 2x the largest
        # request bucket (base.py _encode_buckets)
        bb = bucket_for(n, self._encode_buckets())
        ids = _pad_batch(ids, bb)
        mask = _pad_batch(mask, bb)

        def fn(params, ids, mask):
            return model.apply(params["text_encoder_3"], ids, attention_mask=mask)

        import jax
        import jax.numpy as jnp

        ep = self.encoder_params("text_encoder_3")
        if self.config.model.encoders_on_host:
            # numpy -> host backend directly (no TPU relay round trip)
            cpu = jax.devices("cpu")[0]
            ids_a = jax.device_put(ids, cpu)
            mask_a = jax.device_put(mask, cpu)
        else:
            ids_a, mask_a = jnp.asarray(ids), jnp.asarray(mask)
        out = self._jit(("t5", bb), fn)(ep, ids_a, mask_a)
        return np.asarray(out)[:n]

    def encode_conditioning(self, prompts: List[str], negatives: List[str],
                            resolutions: List[int]) -> List[Dict[str, np.ndarray]]:
        tok1 = self.bundle.tokenizers["tokenizer"]
        tok2 = self.bundle.tokenizers["tokenizer_2"]
        tok3 = self.bundle.tokenizers["tokenizer_3"]
        b = len(prompts)
        joint_dim = self.bundle.models["transformer"].cfg.joint_attention_dim

        def enc(texts):
            ids1 = np.asarray(tok1(texts, max_length=77, padding="max_length",
                                   truncation=True)["input_ids"])
            ids2 = np.asarray(tok2(texts, max_length=77, padding="max_length",
                                   truncation=True)["input_ids"])
            t3 = tok3(texts, max_length=self.T5_SEQ_LEN, padding="max_length",
                      truncation=True)
            ids3 = np.asarray(t3["input_ids"])
            mask3 = np.asarray(t3["attention_mask"])
            e1, p1 = self._encode_clip("text_encoder", ids1, penultimate=True, need_pooled=True)
            e2, p2 = self._encode_clip("text_encoder_2", ids2, penultimate=True, need_pooled=True)
            e3 = self._encode_t5(ids3, mask3)[: len(texts)]
            clip = np.concatenate([e1, e2], axis=-1)[: len(texts)]
            # Zero-pad CLIP features to the joint (T5) width, then concat seqs.
            pad = joint_dim - clip.shape[-1]
            clip = np.pad(clip, [(0, 0), (0, 0), (0, pad)])
            embeds = np.concatenate([clip, e3], axis=1)
            pooled = np.concatenate([p1, p2], axis=-1)[: len(texts)]
            return embeds.astype(np.float32), pooled.astype(np.float32)

        # ONE batched host pass over prompts + negatives: two separate
        # calls each pad to a batch bucket (a b=1 request encoded 2x2
        # padded rows = 4 T5 rows of host compute for 2 useful ones).
        allemb, allpooled = enc(list(prompts) + list(negatives))
        emb, nemb = allemb[:b], allemb[b:]
        pooled, npooled = allpooled[:b], allpooled[b:]
        return [{"embeds": emb[i : i + 1], "neg_embeds": nemb[i : i + 1],
                 "pooled": pooled[i : i + 1], "neg_pooled": npooled[i : i + 1]}
                for i in range(b)]

    def denoiser_forward(self, params, latents_in, t, cond, ctx=None,
                         cache=None, cache_state=None):
        import jax.numpy as jnp

        ehs = jnp.concatenate([cond["neg_embeds"], cond["embeds"]], axis=0)
        pooled = jnp.concatenate([cond["neg_pooled"], cond["pooled"]], axis=0)
        return self.bundle.models["transformer"].apply(
            params["transformer"], latents_in, t, ehs.astype(latents_in.dtype),
            pooled.astype(latents_in.dtype), ctx=ctx)

    def _displaced_ctx_cls(self):
        from sduss_tpu.parallel.displaced import MMDiTShardContext

        return MMDiTShardContext

    def denoise_step(self, reqs_by_res, allow_cold: bool = True):
        """Uniform-resolution batches route through the TOKEN path when the
        token cache is on: the worker's ``mixed`` flag reflects only the
        resolution mixture (engine/worker.py:122), but the MMDiT's ONLY
        cached trunk is the padded-token one — without this override the
        cache silently never engaged in serving (the dense path has no
        token-cache support), so cache-mode runs measured dense."""
        if (self._sd3_cache() is not None
                or self._sd3_deep_span() is not None) and not (
                self.sampler.needs_state and self.config.cache.enabled):
            return self.denoise_step_mixed(reqs_by_res, allow_cold=allow_cold)
        return super().denoise_step(reqs_by_res)

    def denoise_step_mixed(self, reqs_by_res, allow_cold: bool = True):
        """ONE MMDiT step over a mixed-resolution PADDED-TOKEN batch.

        The transformer analog of the UNet patch batch (reference
        split_sample_sd3, modules/SD3Transformer.py:25-262): per-request
        latent token runs are right-padded to a shared sequence bucket and
        masked in attention, so the 24-block trunk compiles once per
        (seq bucket, batch bucket) and serves any resolution mixture.

        ``allow_cold=False``: warm-key routing like the UNet patch path
        (base.py denoise_step_mixed) — a cold (seq, batch, cache) trunk key
        serves this step as dense per-res groups (no token cache) while a
        daemon thread warms the token-path programs on throwaways.
        """
        import jax
        import jax.numpy as jnp
        import numpy as np

        from sduss_tpu.config import bucket_for
        from sduss_tpu.samplers import gather_coeffs, gather_timesteps

        ordered = [r for res in sorted(reqs_by_res) for r in reqs_by_res[res]]
        if not ordered:
            return
        if (len({r.resolution for r in ordered}) <= 1
                and self._sd3_cache() is None
                and self._sd3_deep_span() is None):
            # single resolution, no cache: the dense path is strictly cheaper
            # (no pad).  With the block/compact cache or the span-skip deep
            # cache the token path serves single-res batches too (uniform
            # seq -> no padding waste).
            return self.denoise_step(reqs_by_res)

        tr = self.bundle.models["transformer"]
        ps = tr.cfg.patch_size
        lens = [(r.latent_hw(self.vae_scale) // ps) ** 2 for r in ordered]
        seq_buckets = sorted({(res // self.vae_scale // ps) ** 2
                              for res in self.config.model.resolutions})
        s_pad = bucket_for(max(lens), seq_buckets)
        b = len(ordered)
        bb = bucket_for(b, self.config.scheduler.batch_buckets)

        # -- warm-key routing (host-only; before any device work).  kv_stale
        # flips per step with host-tracked sync state, so require BOTH trunk
        # variants warm when fine_stale_kv is configured.
        if not allow_cold:
            cc = self.config.cache
            has_cache = self._sd3_cache() is not None
            fine = (has_cache and cc.mode == "compact"
                    and cc.patch_fraction < 1.0)
            fine_kv = fine and getattr(cc, "fine_stale_kv", False)
            # non-fine compact runs an ANCHORING sync program on fresh
            # composition state, then the steady capacity-bounded one
            syncs = ((False, True)
                     if has_cache and cc.mode == "compact" and not fine
                     else (False,))
            kvs = (False, True) if fine_kv else (False,)
            deeps = ((None,) if self._sd3_deep_span() is None
                     else ("full", "shallow"))
            variants = [("sd3_mixed", s_pad, bb, has_cache, s, k, dm)
                        for s in syncs for k in kvs for dm in deeps]
            if any(k not in self._executed_keys for k in variants):
                self._queue_mixed_warm(tuple(sorted(
                    (res, len(rs)) for res, rs in reqs_by_res.items())))
                # dense steps advance latents without refreshing KV rows or
                # the span delta; force a sync/full pass when the token path
                # resumes.  Reset ONLY entries holding a request served
                # dense here: a blanket reset stomped the warm daemon's
                # THROWAWAY entry's kv_ok mid-drive, so the stale trunk
                # program never minted and serving would hit it cold — the
                # exact stall warm-key routing exists to prevent.
                served = {r.request_id for rs in reqs_by_res.values()
                          for r in rs}
                for key, st in getattr(self, "_sd3_state", {}).items():
                    if served.intersection(key[2]):
                        st["kv_ok"] = False
                        st["deep"] = None
                return super().denoise_step(reqs_by_res)

        # -- embed per resolution group (scale_model_input + patch+pos embed)
        tables = [r.sampler_table for r in ordered]
        coeffs = gather_coeffs(tables)
        tok_rows = []
        i = 0
        while i < b:
            res = ordered[i].resolution
            j = i
            while j < b and ordered[j].resolution == res:
                j += 1
            group = ordered[i:j]
            g = j - i
            # bucket the group batch axis: raw sizes vary 1..max with batch
            # composition and would mint cold compile keys mid-serving (the
            # round-1 rolling-admission pathology; base.py:16 rationale)
            gb = bucket_for(g, self.config.scheduler.batch_buckets)
            lat = jnp.concatenate([r.latents for r in group], axis=0)
            c0 = np.zeros((gb,), np.float32)
            c0[:g] = coeffs[i:j, 0]
            if gb != g:
                lat = jnp.concatenate(
                    [lat, jnp.repeat(lat[-1:], gb - g, axis=0)], axis=0)
            fn = self._jit(("sd3_embed", res, gb), self._embed_fn)
            toks = fn(self.params, lat, jnp.asarray(c0))[:g]  # (g, s_r, dim)
            pad = s_pad - toks.shape[1]
            if pad:
                toks = jnp.pad(toks, [(0, 0), (0, pad), (0, 0)])
            tok_rows.append(toks)
            i = j
        tokens = jnp.concatenate(tok_rows, axis=0)
        if bb != b:
            tokens = jnp.concatenate(
                [tokens, jnp.repeat(tokens[-1:], bb - b, axis=0)], axis=0)

        mask = np.zeros((bb, s_pad), bool)
        for idx, n in enumerate(lens):
            mask[idx, :n] = True

        t = np.zeros((bb,), np.float32)
        t[:b] = gather_timesteps(tables)
        guidance = np.zeros((bb,), np.float32)
        guidance[:b] = [r.params.guidance_scale if r.params.guidance_scale
                        is not None else self.spec.default_guidance
                        for r in ordered]
        cond = self._stack_cond([r.conditioning for r in ordered], bb)

        cache = self._sd3_cache()
        span = self._sd3_deep_span()
        entry = None
        if cache is not None or span is not None:
            entry = self._sd3_state_entry(ordered, bb, s_pad, cache)
        # Stale-KV fine cache (CacheConfig.fine_stale_kv): the STALE program
        # splices previous-step K/V for unselected tokens; it is valid only
        # once the COMPOSITION's state has been through the SYNC program
        # (host-tracked kv_ok — no device fetch; the same sync-at-state-
        # boundary shape as displaced serving, pipelines/base.py).
        fine = (cache is not None and cache.config.mode == "compact"
                and cache.config.patch_fraction < 1.0)
        kv_stale = (fine and getattr(cache.config, "fine_stale_kv", False)
                    and entry["kv_ok"])
        # non-fine compact: a fresh composition's state must be ANCHORED by
        # a full-capacity step before gate_compact may splice its out rows
        sync = (cache is not None and cache.config.mode == "compact"
                and not fine and not entry["anchored"])
        # Span-skip deep cache (CacheConfig.sd3_deep_span): one mode per
        # batch per step (static shapes, like the UNet _denoise_group_deep);
        # a fresh/reset composition entry has no delta yet -> full.
        deep_mode = None
        if span is not None:
            cc = self.config.cache
            need_full = (entry["deep"] is None
                         or entry["deep_age"] >= max(cc.deep_interval, 1) - 1
                         or any(r.sampler_table.step < cc.deep_warmup
                                for r in ordered))
            deep_mode = "full" if need_full else "shallow"
        trunk_key = ("sd3_mixed", s_pad, bb, cache is not None, sync,
                     kv_stale, deep_mode)
        # donate the composition token state (arg 6): fine stale-KV rows
        # are ~1.5 GB/request at 1024^2 and old+new copies next to 5 GB of
        # params OOM a 16 GB chip (same aliasing fix as the UNet hybrid)
        fn = self._jit(trunk_key,
                       self._make_sd3_trunk_fn(cache, kv_stale, sync,
                                               deep_mode, span),
                       donate=(6,) if cache is not None else ())
        kw = {}
        if deep_mode == "shallow":
            kw["deep_state"] = self._sd3_deep_predicted(entry)
        if cache is None:
            res_call = fn(self.params, tokens, jnp.asarray(mask),
                          jnp.asarray(t), jnp.asarray(guidance), cond, **kw)
            if deep_mode is None:
                out_tokens = res_call
            else:
                out_tokens, deep_out = res_call
        else:
            row_valid = np.zeros((bb,), bool)
            row_valid[:b] = True
            res_call = fn(self.params, tokens, jnp.asarray(mask),
                          jnp.asarray(t), jnp.asarray(guidance),
                          cond, entry["state"], jnp.asarray(row_valid), **kw)
            if deep_mode is None:
                out_tokens, new_state = res_call
            else:
                out_tokens, new_state, deep_out = res_call
            entry["state"] = new_state
            entry["anchored"] = True
            if fine and getattr(cache.config, "fine_stale_kv", False):
                entry["kv_ok"] = True
        if deep_mode == "full":
            self._sd3_deep_update_slope(entry, deep_out)
            entry["deep"] = deep_out
            entry["deep_age"] = 0
        elif deep_mode == "shallow":
            entry["deep_age"] += 1
        # the call above compiled synchronously: the key is warm
        self._executed_keys.add(trunk_key)

        # -- unpatchify + sampler step per resolution group
        i = 0
        while i < b:
            res = ordered[i].resolution
            j = i
            while j < b and ordered[j].resolution == res:
                j += 1
            group = ordered[i:j]
            g = j - i
            gb = bucket_for(g, self.config.scheduler.batch_buckets)
            hp = group[0].latent_hw(self.vae_scale) // ps
            lat = jnp.concatenate([r.latents for r in group], axis=0)
            toks_g = out_tokens[i:j]
            c = np.ones((gb, coeffs.shape[1]), np.float32)
            c[:g] = coeffs[i:j]
            if gb != g:
                lat = jnp.concatenate(
                    [lat, jnp.repeat(lat[-1:], gb - g, axis=0)], axis=0)
                toks_g = jnp.concatenate(
                    [toks_g, jnp.repeat(toks_g[-1:], gb - g, axis=0)], axis=0)
            fn2 = self._jit(("sd3_finish", res, gb), self._finish_fn(hp))
            new_lat = fn2(toks_g, lat, jnp.asarray(c))[:g]
            for k, r in enumerate(group):
                r.latents = new_lat[k : k + 1]
                r.sampler_table.advance()
                r.remain_steps -= 1
            i = j

    # -- fused multi-step dispatch (SchedulerConfig.steps_per_dispatch) -------

    def denoise_chunk(self, reqs_by_res, k: int,
                      allow_cold: bool = True) -> bool:
        """k sampler steps in ONE jitted program for a UNIFORM-resolution
        batch on the token path: embed -> trunk -> unpatchify -> sampler
        step per sub-step, latents + token-cache state + span delta carried
        in-graph (the structure bench_sd3.py's scan body validated on
        chip).  Per-step host dispatch is the serving bottleneck through
        the dev relay (measured: ~0.5 s/step cadence at SD3 b2 against a
        ~130 ms device step, exp/serving_sd3_span_v5e_r2w.json) and pure
        overhead on any host.

        Eligibility (False -> caller falls back to per-step dispatch):
        uniform resolution, stateless sampler, no stale-KV / adaptive
        refresh / span reuse-then-predict (their per-step host decisions
        cannot live in-graph), token-cache state anchored.  Span chunks
        carry the interval PHASE as a traced scalar — in-chunk step j runs
        full iff (phase + j) % interval == interval - 1, the exact
        per-step recurrence — so they are eligible at ANY step, not just
        full boundaries (the old boundary gate left 27 of 30 steps on
        per-step dispatch under the @30 span default)."""
        import jax.numpy as jnp

        ordered = [r for res in sorted(reqs_by_res) for r in reqs_by_res[res]]
        if not ordered or k <= 1:
            return False
        cc = self.config.cache
        cache = self._sd3_cache()
        span = self._sd3_deep_span()
        if (len({r.resolution for r in ordered}) != 1
                or self.sampler.needs_state
                or any(r.remain_steps < k for r in ordered)
                or (cache is not None and cc.mode == "compact"
                    and cc.patch_fraction < 1.0
                    and getattr(cc, "fine_stale_kv", False))
                or getattr(cc, "deep_adaptive", 0.0)
                or (span is not None
                    and float(getattr(cc, "deep_predict", 0.0) or 0.0))):
            return False
        res = ordered[0].resolution
        tr = self.bundle.models["transformer"]
        ps = tr.cfg.patch_size
        hp = ordered[0].latent_hw(self.vae_scale) // ps
        s_pad = hp * hp
        b = len(ordered)
        bb = bucket_for(b, self.config.scheduler.batch_buckets)
        itv = max(cc.deep_interval, 1)
        entry = None
        if cache is not None or span is not None:
            entry = self._sd3_state_entry(ordered, bb, s_pad, cache)
            # compact state must be anchored by a sync step; span chunks
            # must START at a full boundary (the in-graph schedule is
            # j % itv == 0); warmup steps force per-step fulls
            if cache is not None and cc.mode == "compact" \
                    and cc.patch_fraction >= 1.0 and not entry["anchored"]:
                return False
            if any(r.sampler_table.step < cc.deep_warmup for r in ordered) \
                    and span is not None:
                return False
        chunk_key = ("sd3_chunk", s_pad, bb, k, cache is not None,
                     span is not None)
        if not allow_cold and chunk_key not in self._executed_keys:
            return False

        # per-request step tables for the chunk: (k, bb) t, (k, bb, 2) cs
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
        mask = np.zeros((bb, s_pad), bool)
        mask[:b] = True
        row_valid = np.zeros((bb,), bool)
        row_valid[:b] = True
        lat = jnp.concatenate([r.latents for r in ordered], axis=0)
        if bb != b:
            lat = jnp.concatenate(
                [lat, jnp.repeat(lat[-1:], bb - b, axis=0)], axis=0)

        fn = self._jit(chunk_key,
                       self._make_sd3_chunk_fn(cache, span, k, hp),
                       donate=(7,) if cache is not None else ())
        args = [self.params, lat, jnp.asarray(ts), jnp.asarray(cs),
                jnp.asarray(guidance), cond, jnp.asarray(mask)]
        kw = {}
        if cache is not None:
            args += [entry["state"], jnp.asarray(row_valid)]
        if span is not None:
            ctx_len = ordered[0].conditioning["embeds"].shape[1]
            kw["deep0"] = self._chunk_deep0(entry, bb, s_pad, ctx_len)
            kw["itv"] = jnp.int32(itv)
            # Interval PHASE at chunk entry (shallow steps since the last
            # full): in-chunk step j runs full iff (phase + j) % itv ==
            # itv - 1, the exact per-step recurrence — so chunks no longer
            # need to START at a full boundary (under the @30 span default
            # that restriction left 27 of 30 steps on RTT-bound per-step
            # dispatch).  phase is a traced scalar like itv: no new
            # compile keys.
            phase = (itv - 1 if entry["deep"] is None
                     else min(entry["deep_age"], itv - 1))
            kw["phase"] = jnp.int32(phase)
        out = fn(*args, **kw)
        new_lat = out[0]
        pos = 1
        if cache is not None:
            entry["state"] = out[pos]
            entry["anchored"] = True
            pos += 1
        if span is not None:
            entry["deep"] = out[pos]
            # age after the chunk = the per-step recurrence: last in-chunk
            # full at j* (largest j < k with (phase+j) % itv == itv-1)
            # leaves age k-1-j*; no in-chunk full ages the delta by k
            fulls = [j for j in range(k)
                     if (int(phase) + j) % itv == itv - 1]
            entry["deep_age"] = (k - 1 - fulls[-1]) if fulls \
                else int(phase) + k
            entry["deep_slope"] = None
        self._executed_keys.add(chunk_key)
        for i, r in enumerate(ordered):
            r.latents = new_lat[i : i + 1]
            for _ in range(k):
                r.sampler_table.advance()
            r.remain_steps -= k
        return True

    def _chunk_deep0(self, entry, bb: int, s_pad: int, ctx_len: int):
        """In-graph span carry seed.  When no delta is live yet the chunk
        enters at phase itv-1 (step 0 is a full), so these zeros are
        overwritten before any shallow step reads them; with a live delta
        the entry's own state carries in."""
        import jax.numpy as jnp

        if entry["deep"] is not None:
            return entry["deep"]
        tr = self.bundle.models["transformer"]
        span = self._sd3_deep_span()
        dtype = self._latent_dtype()
        d = {"dx": jnp.zeros((2 * bb, s_pad, tr.cfg.dim), dtype)}
        if span[1] < tr.cfg.num_layers:
            d["c"] = jnp.zeros((2 * bb, ctx_len, tr.cfg.dim), dtype)
        return d

    def _make_sd3_chunk_fn(self, cache, span, k: int, hp: int):
        """Traced k-step loop: the SAME trunk builders as the per-step
        path, full/shallow selected in-graph by the phase recurrence
        ``(phase + j) % interval == interval - 1``.  Program contains each trunk
        body once (lax.cond), so compile cost matches one full + one
        shallow step, not k steps."""
        import jax
        import jax.numpy as jnp

        tr = self.bundle.models["transformer"]
        deep = span is not None
        caching = cache is not None
        sampler = self.sampler
        full_fn = self._make_sd3_trunk_fn(cache, False, False,
                                          "full" if deep else None, span)
        sh_fn = (self._make_sd3_trunk_fn(cache, False, False, "shallow", span)
                 if deep else None)

        def fn(params, lat, ts, cs, guidance, cond, mask,
               cache_state=None, row_valid=None, deep0=None, itv=None,
               phase=None):
            def step(trunk):
                def f(j, lat, st, dp):
                    c0, c1 = cs[j, :, 0], cs[j, :, 1]
                    toks = tr.embed_latents(
                        params["transformer"],
                        sampler.scale_model_input(lat, c0))
                    kw = {}
                    if caching:
                        kw = dict(cache_state=st, row_valid=row_valid)
                    if deep:
                        kw["deep_state"] = dp
                    parts = trunk(params, toks, mask, ts[j], guidance,
                                  cond, **kw) if (caching or deep) else \
                        (trunk(params, toks, mask, ts[j], guidance, cond),)
                    combined = parts[0]
                    pos = 1
                    st2, dp2 = st, dp
                    if caching:
                        st2 = parts[pos]
                        pos += 1
                    if deep:
                        dp2 = parts[pos]
                    v = tr.unpatchify(combined, hp, hp)
                    lat2 = sampler.step(lat, v.astype(lat.dtype), c0, c1)
                    return lat2, st2, dp2

                return f

            full_s = step(full_fn)
            sh_s = step(sh_fn) if deep else None

            def body(j, carry):
                lat, st, dp = carry
                if not deep:
                    return (*full_s(j, lat, st, dp),)
                # the per-step full/shallow recurrence at interval PHASE:
                # full when the delta's age reaches itv-1 at this step
                return jax.lax.cond(
                    (phase + j) % itv == itv - 1,
                    lambda a: full_s(*a), lambda a: sh_s(*a),
                    (j, lat, st, dp))

            carry = jax.lax.fori_loop(0, k, body, (lat, cache_state, deep0))
            out = (carry[0],)
            if caching:
                out += (carry[1],)
            if deep:
                out += (carry[2],)
            return out

        return fn

    # -- MMDiT per-block token cache (reference PatchSD3Transformer
    #    CacheManagers, modules/SD3Transformer.py:25-262) -------------------

    def _sd3_cache(self):
        cfg = self.config.cache
        if not cfg.enabled or cfg.mode not in ("block", "compact"):
            return None
        if not hasattr(self, "_sd3_cache_obj"):
            from sduss_tpu.cache.manager import BlockCache

            self._sd3_cache_obj = BlockCache(cfg)
        return self._sd3_cache_obj

    def _sd3_state_entry(self, ordered, bb, s_pad, cache) -> dict:
        """Batch-composition-keyed token-cache state (LRU-bounded).

        Round-2 session 6 redesign: state previously lived per REQUEST
        (gathered into a batch at step entry, scattered back at exit).  At
        SD3 1024^2 that is unserveable on a 16 GB chip: fine stale-KV rows
        are ~1.5 GB per request and the gather/scatter held up to four
        transient copies — the r2n SD3 serving leg died RESOURCE_EXHAUSTED
        at b2 next to 5 GB of params.  Like displaced serving KV
        (base.py _denoise_group_displaced), ONE state pytree now lives per
        batch COMPOSITION: a stable batch reuses it across steps with zero
        per-step reshuffling; any change (membership, seq bucket, cache
        mode) resets to fresh rows.  Fresh rows are the same zeros a new
        request always got (init hits = max_hits outranks everything in the
        gates), and fine stale-KV re-syncs through the kv_ok flag, so the
        only behavior change is that a REGROUPED surviving request loses
        its drift references for one step.

        Returns the store entry: {"state": pytree, "kv_ok": bool}.
        """
        import collections

        if not hasattr(self, "_sd3_state"):
            self._sd3_state = collections.OrderedDict()
        cfg = self.config.cache
        tr = self.bundle.models["transformer"]
        token_fine = (cache is not None and cfg.mode == "compact"
                      and cfg.patch_fraction < 1.0)
        want_kv = token_fine and getattr(cfg, "fine_stale_kv", False)
        ctx_seq = None
        if cache is not None and cfg.mode == "compact" and not token_fine:
            ctx_seq = ordered[0].conditioning["embeds"].shape[1]
        mode_sig = (cache is not None and type(cache).__name__, cfg.mode,
                    token_fine, want_kv, ctx_seq, self._sd3_deep_span())
        key = (s_pad, bb, tuple(r.request_id for r in ordered), mode_sig)
        entry = self._sd3_state.get(key)
        if entry is None:
            layout = tr.token_cache_layout(s_pad)
            dtype = self._latent_dtype()
            # rows are CFG-doubled [uncond x bb | cond x bb], matching the
            # trunk's concat order; zeros for the bb-b padding slots too
            if cache is None:
                state = None
            elif token_fine:
                dual = set(tr.cfg.dual_attention_layers)

                def pairs(k):
                    if not want_kv:
                        return 0
                    return 2 if int(k.removeprefix("block")) in dual else 1

                state = {k: cache.init_token_rows_fine(
                             k, 2 * bb, seq, dim, dtype, kv_pairs=pairs(k))
                         for k, (seq, dim) in layout.items()}
            else:
                state = {k: cache.init_token_rows(k, 2 * bb, seq, dim, dtype,
                                                  ctx_seq=ctx_seq)
                         for k, (seq, dim) in layout.items()}
            # "deep": the span-skip delta pytree from the last FULL step
            # (None until one runs); composition changes reset it, so an
            # admission/finish costs exactly one extra full step.
            entry = {"state": state, "kv_ok": False, "anchored": False,
                     "deep": None, "deep_age": 0, "deep_slope": None}
            self._sd3_state[key] = entry
        self._sd3_state.move_to_end(key)
        # Each 1024^2 fine entry is GBs; the bound trades re-sync steps on
        # composition alternation against HBM (comp_state_lru=1 is the safe
        # setting at 1024^2 fine stale-KV next to 5 GB of params).
        lru = max(int(getattr(cfg, "comp_state_lru", 2)), 1)
        while len(self._sd3_state) > lru:
            self._sd3_state.popitem(last=False)
        # byte budget too (see base._comp_state_entry): token/KV/deep rows
        # scale with bucket x seq; the newest entry is always kept
        from sduss_tpu.pipelines.base import _state_nbytes

        budget = float(getattr(cfg, "comp_state_bytes", 3e9))
        while (len(self._sd3_state) > 1
               and sum(_state_nbytes(e) for e in self._sd3_state.values())
               > budget):
            self._sd3_state.popitem(last=False)
        return entry

    def _sd3_deep_span(self):
        """(lo, hi) span for the MMDiT span-skip deep cache, or None.

        CacheConfig.sd3_deep_span; scheduling reuses deep_interval /
        deep_warmup.  Orthogonal to the token gates: composes with mode
        "compact"/patch_fraction (the SD3 deep x fine hybrid) or runs
        span-only with the gates off."""
        cc = self.config.cache
        span = getattr(cc, "sd3_deep_span", None)
        if not cc.enabled or span is None:
            return None
        return tuple(span)

    def serving_state_spec(self, res: int, bucket: int):
        """SD3 analog of the base estimate: token-cache rows (+ fine KV)
        and the span delta the uniform (res, bucket) token-path step mints
        (_sd3_state_entry builders, traced abstractly)."""
        import jax
        import jax.numpy as jnp

        cc = self.config.cache
        cache = self._sd3_cache()
        span = self._sd3_deep_span()
        if cache is None and span is None:
            return None
        tr = self.bundle.models["transformer"]
        ps = tr.cfg.patch_size
        s_pad = (res // self.vae_scale // ps) ** 2
        ctx_seq = 77 + self.T5_SEQ_LEN  # CLIP + T5 conditioning rows
        dtype = self._latent_dtype()
        token_fine = (cache is not None and cc.mode == "compact"
                      and cc.patch_fraction < 1.0)
        want_kv = token_fine and getattr(cc, "fine_stale_kv", False)
        n = 2 * bucket

        def build():
            out = {}
            if cache is not None:
                layout = tr.token_cache_layout(s_pad)
                if token_fine:
                    dual = set(tr.cfg.dual_attention_layers)

                    def pairs(k):
                        if not want_kv:
                            return 0
                        return 2 if int(k.removeprefix("block")) in dual else 1

                    out["state"] = {
                        k: cache.init_token_rows_fine(k, n, s, d, dtype,
                                                      kv_pairs=pairs(k))
                        for k, (s, d) in layout.items()}
                else:
                    out["state"] = {
                        k: cache.init_token_rows(
                            k, n, s, d, dtype,
                            ctx_seq=ctx_seq if cc.mode == "compact" else None)
                        for k, (s, d) in layout.items()}
            if span is not None:
                d = {"dx": jnp.zeros((n, s_pad, tr.cfg.dim), dtype)}
                if span[1] < tr.cfg.num_layers:
                    d["c"] = jnp.zeros((n, ctx_seq, tr.cfg.dim), dtype)
                out["deep"] = d
            return out

        return jax.eval_shape(build)

    # -- span reuse-then-predict (CacheConfig.deep_predict) --------------------

    def _sd3_deep_predicted(self, entry):
        """Span delta a SHALLOW step should splice: the last full pass's
        {dx[, c]} extrapolated ``deep_age + 1`` steps along the inter-full
        velocity when reuse-then-predict is on — the MMDiT analog of the
        UNet's _deep_predicted (pipelines/base.py; arXiv 2505.14741 shape).
        A different INPUT to the unchanged shallow program: no new trunk
        compile keys."""
        import jax
        import jax.numpy as jnp

        m = float(getattr(self.config.cache, "deep_predict", 0.0) or 0.0)
        dp = entry["deep"]
        sl = entry.get("deep_slope")
        if not m or sl is None:
            return dp
        shapes = tuple(sorted((k, v.shape) for k, v in dp.items()))

        def fn(dp, sl, k):
            return jax.tree.map(
                lambda d, s: (d.astype(jnp.float32)
                              + m * k * s.astype(jnp.float32)).astype(d.dtype),
                dp, sl)

        return self._jit(("sd3_deep_predict", shapes, m), fn)(
            dp, sl, jnp.float32(entry["deep_age"] + 1))

    def _sd3_deep_update_slope(self, entry, new) -> None:
        """On a FULL pass: per-step span-delta velocity (new - old) / gap,
        stored in the feature dtype.  A structure/shape change (composition
        reset, span change) clears the slope — extrapolating across it
        would be garbage."""
        import jax
        import jax.numpy as jnp

        if not float(getattr(self.config.cache, "deep_predict", 0.0) or 0.0):
            return
        old = entry["deep"]
        if (old is None or set(old) != set(new)
                or any(old[k].shape != new[k].shape for k in new)):
            entry["deep_slope"] = None
            return
        shapes = tuple(sorted((k, v.shape) for k, v in new.items()))

        def fn(new, old, g):
            return jax.tree.map(
                lambda n, o: ((n.astype(jnp.float32)
                               - o.astype(jnp.float32)) / g).astype(n.dtype),
                new, old)

        entry["deep_slope"] = self._jit(("sd3_deep_slope", shapes), fn)(
            new, old, jnp.float32(entry["deep_age"] + 1))

    def _make_sd3_trunk_fn(self, cache, kv_stale: bool = False,
                           sync: bool = False, deep_mode=None,
                           deep_span=None):
        def fn(params, tokens, mask, t, guidance, cond, cache_state=None,
               row_valid=None, deep_state=None):
            import jax.numpy as jnp

            tr = self.bundle.models["transformer"]
            tok2 = jnp.concatenate([tokens, tokens], axis=0)
            mask2 = jnp.concatenate([mask, mask], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ehs = jnp.concatenate([cond["neg_embeds"], cond["embeds"]], axis=0)
            pooled = jnp.concatenate([cond["neg_pooled"], cond["pooled"]], axis=0)
            rv2 = None
            if row_valid is not None:
                rv2 = jnp.concatenate([row_valid, row_valid], axis=0)
            kw = ({} if deep_mode is None else
                  dict(deep_mode=deep_mode, deep_span=deep_span,
                       deep_state=deep_state))
            deep_out = None
            if cache is not None:
                res = tr.apply_tokens(
                    params["transformer"], tok2, mask2, t2,
                    ehs.astype(tokens.dtype), pooled.astype(tokens.dtype),
                    cache=cache, cache_state=cache_state, row_valid=rv2,
                    fine_kv_stale=kv_stale, compact_sync=sync, **kw)
                if deep_mode is not None:
                    out, new_state, deep_out = res
                else:
                    out, new_state = res
            else:
                res = tr.apply_tokens(
                    params["transformer"], tok2, mask2, t2,
                    ehs.astype(tokens.dtype), pooled.astype(tokens.dtype),
                    **kw)
                if deep_mode is not None:
                    out, deep_out = res
                else:
                    out = res
            uncond, text = jnp.split(out, 2, axis=0)
            g = guidance.reshape(-1, 1, 1)
            combined = uncond + g * (text - uncond)
            parts = (combined,)
            if cache is not None:
                parts += (new_state,)
            if deep_mode is not None:
                parts += (deep_out,)
            return parts if len(parts) > 1 else combined

        return fn

    def _embed_fn(self, params, latents, c0):
        tr = self.bundle.models["transformer"]
        lat = self.sampler.scale_model_input(latents, c0)
        return tr.embed_latents(params["transformer"], lat)

    def _finish_fn(self, hp: int):
        tr = self.bundle.models["transformer"]

        def fn(out_tokens, latents, coeffs):
            v = tr.unpatchify(out_tokens, hp, hp)
            return self.sampler.step(latents, v.astype(latents.dtype),
                                     coeffs[:, 0], coeffs[:, 1])

        return fn
