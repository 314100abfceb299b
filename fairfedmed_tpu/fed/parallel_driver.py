"""Client-parallel federated rounds as product code.

This is the TPU-native execution path for the CLI's federated branches
(fedavg / fedprox / PromptFL / FedOTP / FedOTPLinearFT / FedOTPLoRA / local,
``--parallel_clients``), on both backbone families — ViT and ModifiedResNet
(whose per-client BatchNorm statistics ride the stacked trainable as
``__bn_stats__``) — replacing the reference's time-multiplexed
client loop (reference federated_main.py:616-726: load state_dict → train →
deepcopy → host aggregation, once per client per round) with:

* ONE SPMD program per round training every selected client simultaneously —
  per-client trainables stacked on a ``clients`` mesh axis
  (:func:`..fed.parallel.make_client_train_round`); on a single chip
  co-located clients scan SEQUENTIALLY so each step stays on the
  throughput-optimal per-step batch (vmap-widening measured slower:
  1048 img/s at batch 32 vs 847 at 64), on a pod slice they shard over ICI;
* per-client trainable/optimizer pytrees resident ON DEVICE between rounds —
  no state_dict pulls inside the round loop; the host sees only the packed
  per-round metrics vector;
* FedAvg/EMA aggregation + personalization as jitted tree programs over the
  stacked client axis (a weighted reduction over a client-sharded axis lowers
  to ICI collectives under GSPMD).

Documented semantic deltas vs the sequential host loop (both intentional):

* **per-client optimizer state** — the sequential path runs every client
  through ONE trainer whose momentum/Adam buffers leak from client to client,
  an artifact of time-multiplexing one accelerator.  Clients here own their
  optimizer state (and keep it across rounds).  With momentum-free SGD the two
  paths coincide exactly (tests/test_parallel_cli.py asserts this).
* **per-round metrics** — per-batch console lines are a sequential-loop
  artifact; the parallel round prints one loss/acc line per client per round.
* clients whose dataset is smaller than the batch size train one batch padded
  by cycling samples (the sequential path trains the short batch as-is).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import CLIENT_AXIS, DATA_AXIS
from ..core.pytree import flatten_paths, unflatten_like as _unflatten_like
from ..utils.profiling import heartbeat, stamp
from .aggregate import _freqs
from .parallel import make_client_train_round


def _map2_with_path(fn, tree_a, tree_b):
    """map_with_path over two trees with identical structure."""
    fa, fb = flatten_paths(tree_a), flatten_paths(tree_b)
    return _unflatten_like(tree_a, {k: fn(k, fa[k], fb[k]) for k in fa})


def _pad_rows(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad the leading axis to ``n`` rows by cycling (np.resize semantics)."""
    if arr.shape[0] == n:
        return arr
    reps = -(-n // arr.shape[0])
    return np.concatenate([arr] * reps, axis=0)[:n]


class ParallelRoundRunner:
    """Owns the device-resident per-client state and the compiled round.

    ``trainer`` is a built GLP_OT / GLP_OT_SVLoRA / PromptFL-family trainer
    (ViT or ModifiedResNet backbone); its
    ``trainable``/``opt_state`` at construction seed every client.
    """

    def __init__(self, trainer, cfg, args, datanumber_client,
                 datanumber_client_by_attr):
        self.trainer = trainer
        self.cfg = cfg
        self.args = args
        self.datanumber_client = list(datanumber_client)
        self.datanumber_client_by_attr = datanumber_client_by_attr
        self.num_users = cfg.DATASET.USERS
        self.num_groups = getattr(trainer, "num_groups", 1)
        self.avg_prompt = int(args.avg_prompt)
        self.local_s = bool(cfg.TRAINER.GLP_OT_LORA.LOCAL_S)
        self.shared_half_s = bool(args.shared_half_s)

        trainer.make_parallel_local_step()  # probe: raises for unsupported backbones

        C = self.num_users
        # every client starts from the same init — broadcast then materialize
        stack = lambda x: jnp.broadcast_to(x[None], (C,) + x.shape)

        @jax.jit
        def init_stacked(t, o):
            return (jax.tree_util.tree_map(stack, t),
                    jax.tree_util.tree_map(stack, o))

        base_t = (trainer.parallel_trainable()
                  if hasattr(trainer, "parallel_trainable")
                  else trainer.trainable)
        self.personal_t, self.stacked_o = init_stacked(
            base_t, trainer.opt_state)
        self.global_t = base_t
        self._meshes = {}
        self._train_fns = {}
        self._data_cache = {}  # client idx -> device-resident decoded arrays
        self._eval_cache = {}
        # ONE budget across every client's train+eval cache (not per set):
        # 50-user runs would otherwise device_put ~50 x 300 MB of images and
        # OOM a 16 GB chip mid-run; over-budget sets degrade to host streaming
        self._cache_budget = int(os.environ.get(
            "FAIRFEDMED_DEVICE_CACHE_BYTES", 4 << 30))
        self._cached_bytes = 0
        self._agg_fns = {}
        self._saved_steps = set()  # round checkpoints THIS run wrote
        # persistent state lives replicated over ALL devices; a round whose
        # mesh spans a device subset (frac-sampled m with awkward divisors)
        # reshards its outputs back here before aggregation
        self._full_mesh = Mesh(
            np.asarray(jax.devices()).reshape(-1), ("all",))
        self._replicated = NamedSharding(self._full_mesh, P())

        # fused per-round programs: ONE dispatch each instead of one eager op
        # per pytree leaf (each eager op costs a tunnel round-trip on a
        # remote-TPU attachment)
        @jax.jit
        def gather_fn(personal_t, stacked_o, idx, lrs):
            sel_t = jax.tree_util.tree_map(lambda x: x[idx], personal_t)
            sel_o = jax.tree_util.tree_map(lambda x: x[idx], stacked_o)
            sel_o.hyperparams["learning_rate"] = lrs
            return sel_t, sel_o

        self._gather_fn = gather_fn
        self._attr_col = None
        if not getattr(trainer, "disable_attr", True):
            self._attr_col = list(cfg.DATASET.ATTRIBUTES).index(
                cfg.DATASET.ATTRIBUTE_TYPE)

    # ------------------------------------------------------------- plumbing
    def _mesh(self, m: int):
        """(clients × data) mesh for an m-client round: the client-shard count
        must divide m, and the data-axis size must divide the batch size."""
        if m not in self._meshes:
            bs = self.cfg.DATALOADER.TRAIN_X.BATCH_SIZE
            devices = jax.devices()
            n = len(devices)
            c = min(m, n)
            while c > 1 and (n % c != 0 or m % c != 0):
                c -= 1
            d = n // c
            if not getattr(self.trainer, "supports_data_axis", True):
                d = 1  # e.g. RN BatchNorm: batch stats must span the batch
            while d > 1 and bs % d != 0:
                d -= 1
            arr = np.asarray(devices[: c * d]).reshape(c, d)
            self._meshes[m] = Mesh(arr, (CLIENT_AXIS, DATA_AXIS))
        return self._meshes[m]

    def _train_fn(self, m: int, fedprox_mu=None):
        key = (m, fedprox_mu)
        if key not in self._train_fns:
            mesh = self._mesh(m)
            d_axis = DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None
            local_step = self.trainer.make_parallel_local_step(
                data_axis=d_axis, fedprox_mu=fedprox_mu)
            self._train_fns[key] = make_client_train_round(mesh, local_step)
        return self._train_fns[key]

    def _ensure_device_cache(self, idx: int):
        """Decode client ``idx``'s train set ONCE and keep it device-resident.

        Only for transform-free pipelines (the medical datasets normalize on
        device inside the jitted step): with a host-side random transform the
        per-epoch images differ and must be re-decoded.  Falls back (None)
        when the pipeline has transforms/samplers or the set exceeds the
        cache cap (FAIRFEDMED_DEVICE_CACHE_BYTES, default 4 GiB)."""
        if idx in self._data_cache:
            return self._data_cache[idx]
        stamp(f"device_cache:decode_start client={idx}")
        decoded = self._decode_loader(self.trainer.fed_train_loader_x_dict[idx])
        if decoded is None:
            self._data_cache[idx] = None
            return None
        imgs, labels, attrs = decoded
        stamp(f"device_cache:decode_done client={idx} ({imgs.nbytes >> 20} MiB)")
        cache = {"img": jax.device_put(imgs),
                 "label": jax.device_put(labels)}
        stamp(f"device_cache:push_done client={idx}")
        if self._attr_col is not None:
            cache["attr"] = jax.device_put(
                attrs[:, self._attr_col].astype(np.int32))
        self._cached_bytes += imgs.nbytes
        self._data_cache[idx] = cache
        return cache

    def _decode_loader(self, loader):
        """Decode a ClientLoader's full dataset in index order, or None when
        the loader can't be cached: a host transform (per-epoch images
        differ), a structured sampler (iteration order isn't index order), a
        dataset without the load_item protocol, an empty set, or a set that
        would push the FLEET-WIDE cache total (train + eval, every client)
        over FAIRFEDMED_DEVICE_CACHE_BYTES (default 4 GiB).  Shared by the
        train and eval caches so the guards can't drift apart."""
        ds = loader.dataset
        if (loader.transform is not None or loader.sampler is not None
                or not hasattr(ds, "load_item")):
            return None
        n = len(ds)
        if n == 0:
            # empty train set: nothing to cache (and no shapes to build a
            # cache from) — the host batch path masks such a client to zero
            # scan steps, matching the sequential loop's zero batches
            return None
        budget_left = self._cache_budget - self._cached_bytes
        # Native-uint8 decode protocol (load_item_u8): uint8-source datasets
        # skip the per-item fp32 conversion, the fp32 stack and the
        # integrality check below — on the 1-core host that's ~4x the memory
        # traffic of the payload, the dominant decode cost for volume sets
        # (measured 130 s → ~35 s at the 2×256-volume OCT fixture).  The
        # result is bit-identical: the in-step astype(float32) recreates the
        # exact values the fp32 path would have cached.
        u8_fn = getattr(ds, "load_item_u8", None)
        first_u8 = u8_fn(0) if u8_fn is not None else None
        items = imgs = None
        fb_start = 1  # fp32-loop start index (past any reused u8 prefix)
        prefetched = False
        if first_u8 is not None:
            if first_u8[0].nbytes * n > budget_left:
                return None
            if hasattr(ds, "prefetch"):
                ds.prefetch(range(1, n))
                prefetched = True
            u8_items = [first_u8]
            try:
                for i in range(1, n):
                    it = u8_fn(i)
                    if it is None:
                        # heterogeneous set (e.g. one mid-set file needs a
                        # float resize): REUSE the already-decoded u8 prefix
                        # (its fp32 values are bit-identical by the protocol
                        # contract) and continue with the general loader from
                        # the break index — restarting from item 0 would
                        # re-pay the whole decode (prefetch tickets for
                        # consumed items are popped)
                        stamp(f"device_cache:u8_fallback at item {i}/{n}")
                        items, fb_start, u8_items = u8_items, i, None
                        break
                    u8_items.append(it)
                    heartbeat()  # decode is long legit host work: keep the
                    # tunnel poker from probing mid-decode
            except BaseException:
                # a decode failure mid-set (corrupt NPZ member) must not
                # leak the undrained prefetch tickets' decoded payloads for
                # the process lifetime (ClientLoader.__iter__ has the same
                # guard)
                if hasattr(ds, "clear_prefetch"):
                    ds.clear_prefetch()
                raise
            if u8_items is not None:
                items = u8_items
                imgs = np.stack([it[0] for it in items])
        if imgs is None:
            # estimate from ONE item before decoding the whole set — an over-
            # budget client should not cost a multi-GiB decode to be refused.
            # An integral-valued first item predicts uint8 STORAGE (4x
            # smaller), so budget the estimate at that size — the exact
            # post-conversion check below still enforces the real footprint.
            if items is None:
                items = [ds.load_item(0)]
            f0 = np.asarray(items[0][0], np.float32)
            est = f0.nbytes * n
            if (f0.size and 0.0 <= float(f0.min()) and float(f0.max()) <= 255.0
                    and np.array_equal(f0, f0.astype(np.uint8))):
                est //= 4
            if est > budget_left:
                # reachable with live tickets only after a u8 mid-set
                # fallback (the prefetch covered items the u8 loop never
                # consumed) — drop them before refusing the cache
                if prefetched and hasattr(ds, "clear_prefetch"):
                    ds.clear_prefetch()
                return None
            if hasattr(ds, "prefetch") and not prefetched:
                ds.prefetch(range(1, n))
                prefetched = True
            try:
                for i in range(fb_start, n):
                    items.append(ds.load_item(i))
                    heartbeat()
            except BaseException:
                if prefetched and hasattr(ds, "clear_prefetch"):
                    ds.clear_prefetch()
                raise
            imgs = np.stack([np.asarray(it[0], np.float32)
                             for it in items])
            # Integral-valued pixel sets (uint8 sources: medical NPZ
            # payloads, CIFAR, image files — anything not float-resized)
            # ride as uint8: 4x less host->device transfer (the dominant
            # round-0 cost on a remote-TPU tunnel) and 4x less HBM, exactly
            # equal after the in-step astype(float32).
            if imgs.size and 0.0 <= float(imgs.min()) and float(imgs.max()) <= 255.0:
                as_u8 = imgs.astype(np.uint8)
                if np.array_equal(imgs, as_u8):
                    imgs = as_u8
            # exact footprint check AFTER the u8 conversion: what counts
            # against the fleet budget is the STORED array, not the decode
            if imgs.nbytes > budget_left:
                return None
        labels = np.asarray([it[1] for it in items], np.int32)
        attrs = (np.stack([it[2] for it in items]).astype(np.int32)
                 if items[0][2] is not None else None)
        return imgs, labels, attrs

    def _round_batches_device(self, idxs_users: Sequence[int]):
        """Per-round batch streams as ONE jitted device program gathering from
        the cached decoded sets — the only host work is drawing the same
        ``np.random.permutation`` the sequential loader would (RNG parity with
        ClientLoader._indices) and shipping the tiny index matrices.

        Fusing the per-client/per-key gathers into a single dispatch matters
        on a remote-TPU attachment: eager indexing cost one tunnel round-trip
        PER (client, key) — ~9 dispatches ≈ 0.1-0.35 s/round, the largest
        fixed cost in the round-2 profile."""
        caches = [self._ensure_device_cache(i) for i in idxs_users]
        if any(c is None for c in caches):
            return None, None
        bs = self.cfg.DATALOADER.TRAIN_X.BATCH_SIZE
        idx_mats, n_steps = [], []
        for c in caches:
            n = int(c["label"].shape[0])
            perm = np.random.permutation(n)
            stop = (n // bs) * bs if n >= bs else n
            sel = perm[:stop]
            if stop < bs:  # short client: one batch padded by cycling
                sel = np.resize(sel, bs)
            steps = max(stop // bs, 1)
            idx_mats.append(sel.reshape(steps, bs))
            n_steps.append(steps)
        S = max(n_steps)
        mats = np.stack([
            np.concatenate([m_, np.repeat(m_[:1], S - m_.shape[0], axis=0)])
            if m_.shape[0] < S else m_  # pad steps (masked by n_steps)
            for m_ in idx_mats]).astype(np.int32)  # [m, S, B]

        if "assemble" not in self._agg_fns:
            @jax.jit  # retraces per (m, cache-shape) signature automatically
            def assemble(caches, mats):
                return {k: jnp.stack([c[k][mats[j]]
                                      for j, c in enumerate(caches)])
                        for k in caches[0]}
            self._agg_fns["assemble"] = assemble
        return self._agg_fns["assemble"](tuple(caches), jnp.asarray(mats)), \
            np.asarray(n_steps, np.int32)

    def _round_batches(self, idxs_users: Sequence[int]):
        """Drain each selected client's train loader into stacked arrays
        [m, S, B, ...] (+ per-client step counts for the scan mask)."""
        trainer = self.trainer
        streams, n_steps = [], []
        bs = self.cfg.DATALOADER.TRAIN_X.BATCH_SIZE
        for idx in idxs_users:
            per = {"img": [], "label": [], "attr": []}
            for batch in trainer.fed_train_loader_x_dict[idx]:
                per["img"].append(_pad_rows(np.asarray(batch["img"]), bs))
                per["label"].append(_pad_rows(
                    np.asarray(batch["label"], np.int32), bs))
                if self._attr_col is not None:
                    per["attr"].append(_pad_rows(np.asarray(
                        batch["attrs"][:, self._attr_col], np.int32), bs))
            n_steps.append(len(per["img"]))
            streams.append(per)
        S = max(n_steps)
        if S == 0:
            # the sequential loop would train zero batches for every client;
            # there is no shape to build even a masked batch stream from
            raise ValueError(
                "every selected client has an empty train set "
                f"(clients {list(idxs_users)})")
        # a client with an EMPTY train set contributes zero scan steps (the
        # n_steps mask skips them all, like the sequential loop's zero
        # batches); its stream is zero filler shaped like a non-empty peer's
        template = next(p for p, n in zip(streams, n_steps) if n > 0)
        out = {}
        for key in ("img", "label", "attr"):
            if not template[key]:
                continue
            rows = []
            for per in streams:
                stream = (np.stack(per[key]) if per[key] else
                          np.zeros((1,) + template[key][0].shape,
                                   template[key][0].dtype))
                if stream.shape[0] < S:  # pad steps (masked by n_steps)
                    pad = np.repeat(stream[:1], S - stream.shape[0], axis=0)
                    stream = np.concatenate([stream, pad], axis=0)
                rows.append(stream)
            out[key] = np.stack(rows)  # [m, S, B, ...]
        return out, np.asarray(n_steps, np.int32)

    # ------------------------------------------------------------- round
    def run_round(self, epoch: int, idxs_users: Sequence[int], max_epoch: int,
                  mode: str = "ema_personal",
                  test_users: Optional[Sequence[int]] = None,
                  fedprox_mu: Optional[float] = None,
                  eval_users: Optional[Sequence[int]] = None,
                  deferred: bool = False):
        """Train the selected clients in parallel, aggregate, personalize.

        ``mode='ema_personal'`` follows the FedOTPLoRA branch (EMA aggregation,
        group-weighted lora_S, shared_half_s, local prompt rows / lora_S kept
        for clients listed in args.idxs_users_train); ``mode='fedavg'`` is a
        plain weighted average of the full trainable with no personalization;
        ``mode='prompt_personal'`` follows the PromptFL/FedOTP branch — only
        prompt rows [:avg_prompt] aggregate, every client keeps its own local
        rows, and non-prompt trainables — including RN ``__bn_stats__`` —
        stay per-client local (the sequential path leaks them between clients
        through the shared trainer — a time-multiplexing artifact we do not
        reproduce; a client unselected so far evaluates with its init stats,
        never with another client's);
        ``mode='local_personal'`` follows the no-aggregation ``local``
        branch — trained clients keep their own full trainables, the
        global model is untouched;
        ``mode='fedavg_personal'`` follows the FedOTPLinearFT branch — plain
        full-state FedAvg (no EMA, no group weighting), with EVERY test user
        keeping its own local prompt rows (+ local lora_S when LOCAL_S): a
        user not trained this round keeps its previous personal rows, which by
        induction are its last-trained rows — the reference's
        ``local_weights_0[idx]`` store (federated_main.py:487-602).
        """
        import time as _time
        timing = os.environ.get("FAIRFEDMED_TIMING") == "1"
        tick = _time.perf_counter

        idxs_users = [int(i) for i in idxs_users]
        stamp(f"round:start epoch={epoch}")
        m = len(idxs_users)
        mesh = self._mesh(m)
        train_fn = self._train_fn(m, fedprox_mu)
        trainer = self.trainer
        t0 = tick()

        # --- per-client LR: the reference steps ONE shared scheduler once
        # per client-local-epoch PER REGISTERED MODEL NAME (Dassl
        # trainer.py:253-258; two names when the image encoder is unfrozen),
        # so client j of this round trains at lr(_lr_steps + j*mult)
        mult = getattr(trainer, "lr_step_multiplier", 1)
        lrs = [trainer.lr_sched.lr(trainer._lr_steps + j * mult)
               for j in range(m)]
        trainer._lr_steps += m * mult

        idx_arr = jnp.asarray(np.asarray(idxs_users, np.int32))
        sel_t, sel_o = self._gather_fn(
            self.personal_t, self.stacked_o, idx_arr,
            jnp.asarray(lrs, jnp.float32))

        batches, n_steps = self._round_batches_device(idxs_users)
        if batches is None:  # transform pipeline active: host assembly path
            batches_np, n_steps = self._round_batches(idxs_users)
            batches = batches_np
        if timing:
            print(f"[timing] batch assembly: {tick() - t0:.3f}s")
            t0 = tick()
        b_shard = NamedSharding(mesh, P(CLIENT_AXIS, None, DATA_AXIS))
        c_shard = NamedSharding(mesh, P(CLIENT_AXIS))
        if mesh.devices.size > 1:
            batches = {k: jax.device_put(v, b_shard)
                       for k, v in batches.items()}
            sel_t = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, c_shard), sel_t)
            sel_o = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, c_shard), sel_o)
        else:
            # one-device mesh: every named sharding is the device the arrays
            # already live on — resharding would only queue useless transfers
            # on the (possibly remote) device stream
            batches = dict(batches)

        if timing:
            jax.block_until_ready(batches)
            print(f"[timing] device_put: {tick() - t0:.3f}s")
            t0 = tick()

        frozen = trainer.frozen
        if fedprox_mu is not None:
            # FedProx pulls toward the round's global prompt — threaded as a
            # frozen-side arg so the jit signature stays stable across rounds
            frozen = dict(frozen)
            frozen["__ctx_global__"] = self.global_t[
                "prompt_learner"]["ctx"].astype(jnp.float32)
        trained_t, trained_o, metrics = train_fn(
            sel_t, sel_o, frozen, batches,
            jax.device_put(jnp.asarray(n_steps), c_shard))
        if timing:
            jax.block_until_ready(trained_t)
            print(f"[timing] train program: {tick() - t0:.3f}s")
            t0 = tick()

        if mesh.devices.size != len(jax.devices()):
            # partial-device round mesh: bring outputs back to the full set
            trained_t = jax.device_put(trained_t, self._replicated)
            trained_o = jax.device_put(trained_o, self._replicated)
            metrics = jax.device_put(metrics, self._replicated)

        # --- aggregation weights (host scalars, fed/aggregate.py semantics)
        freqs, freqs_by_attr = _freqs(
            idxs_users, self.datanumber_client,
            self.datanumber_client_by_attr if mode == "ema_personal" else None)
        weights = jnp.asarray([freqs[i] for i in idxs_users], jnp.float32)
        group_w = None
        if freqs_by_attr is not None:
            gw = np.stack([freqs_by_attr[i] for i in idxs_users])
            # The histogram width is OBSERVATION-dependent (count_by_attribute
            # returns [0..max seen group id]); when no client's data reaches
            # the model's last group it is narrower than lora_S's group dim.
            # The reference (fed_utils.py:18-19, shape guard) and the
            # sequential path (aggregate._is_group_s) then silently fall back
            # to the plain client-weighted mean for lora_S — reproduce that
            # instead of reshaping a too-narrow weight matrix.
            if gw.shape[1] == self.num_groups:
                group_w = jnp.asarray(gw, jnp.float32)
        beta_decay = jnp.float32(0.999 * (epoch / max(max_epoch, 1)))

        if test_users is None or len(test_users) == 0:
            test_users = list(range(self.num_users))
        update_idx = jnp.asarray(np.asarray(test_users, np.int32))
        ts = set(test_users)
        keep_mask = jnp.asarray(
            np.asarray([i in self.args.idxs_users_train and i in ts
                        for i in idxs_users], bool))

        # aggregation + personalization + optimizer-state scatter (trained
        # optimizer states persist per client across rounds) as ONE dispatch
        agg = self._agg_fn(mode, group_w is not None)
        if group_w is None:  # keep the jit signature stable per cache entry
            self.global_t, self.personal_t, self.stacked_o = agg(
                trained_t, self.global_t, self.personal_t, self.stacked_o,
                trained_o, weights, beta_decay, idx_arr, update_idx, keep_mask)
        else:
            self.global_t, self.personal_t, self.stacked_o = agg(
                trained_t, self.global_t, self.personal_t, self.stacked_o,
                trained_o, weights, group_w, beta_decay, idx_arr, update_idx,
                keep_mask)

        if timing:
            jax.block_until_ready(self.personal_t)
            print(f"[timing] aggregate+scatter: {tick() - t0:.3f}s")
            t0 = tick()

        # --- pipelining: dispatch the round's eval program NOW (it queues
        # behind the aggregation on the device stream); parallel_eval picks
        # the pending dispatch up
        self._pending_eval = (self._eval_dispatch([int(i) for i in eval_users])
                              if eval_users is not None else None)
        if self._pending_eval is not None:
            # epoch tag: parallel_eval must never return one round's logits
            # labeled as another's under out-of-order deferred resolves
            self._pending_eval["epoch"] = epoch

        # everything up to here was DISPATCH (async under jit): the round's
        # only blocking host work lives in resolve_round.  ``deferred=True``
        # hands that half to the caller, who dispatches the NEXT round first
        # so this round's fetch overlaps its device execution (the device
        # stream is serial; the host round-trip is the only dead time).
        handle = {
            "epoch": epoch, "max_epoch": max_epoch, "timing": timing,
            "idxs_users": idxs_users, "lrs": lrs, "n_steps": n_steps,
            "metrics": metrics, "pending_eval": self._pending_eval,
            # round-r state refs for the optional round checkpoint — by
            # resolve time self.{global_t,personal_t,stacked_o} may already
            # hold round r+1's arrays (same for the LR step counter)
            "state": (self.global_t, self.personal_t, self.stacked_o),
            "lr_steps": int(self.trainer._lr_steps),
        }
        self._pending_eval = None
        if deferred:
            return handle
        return self.resolve_round(handle)

    def resolve_round(self, handle):
        """Blocking half of a round: ONE combined host transfer (train
        metrics + eval logits — every blocking fetch costs a tunnel
        round-trip on remote TPU), the per-client loss lines, and the
        optional round checkpoint.  Reinstalls the round's dispatched eval
        so the next ``parallel_eval`` call picks it up."""
        import time as _time
        timing = handle["timing"]
        tick = _time.perf_counter
        t0 = tick()

        pend = handle["pending_eval"]
        if pend is not None:
            ms, logits_host = jax.device_get(
                (handle["metrics"], pend["logits"]))
            ms = np.asarray(ms)  # [m, S, 3] — loss, valid, acc (0 on pad)
            pend["logits_host"] = np.asarray(logits_host, np.float32)
        else:
            ms = np.asarray(handle["metrics"])
        self._pending_eval = pend
        if timing:
            print(f"[timing] metrics fetch: {tick() - t0:.3f}s")
        n_steps, lrs = handle["n_steps"], handle["lrs"]
        for j, idx in enumerate(handle["idxs_users"]):
            nv = max(float(ms[j, :, 1].sum()), 1.0)
            print(f"client {idx}: steps {int(n_steps[j])} "
                  f"loss {ms[j, :, 0].sum() / nv:.4f} "
                  f"acc {ms[j, :, 2].sum() / nv:.4f} lr {lrs[j]:.6e}")

        # optional per-round Orbax checkpoint of the whole federated state
        # (--resume DIR or FAIRFEDMED_ROUND_CKPT=<dir> is the opt-in;
        # TRAIN.CHECKPOINT_FREQ refines the cadence, with the config default 0
        # meaning EVERY round — preemption recovery is the whole point of
        # setting it).  Only this run's latest step is kept — resume needs
        # one, and a full stacked state per round would fill the disk.
        epoch, max_epoch = handle["epoch"], handle["max_epoch"]
        ckpt_dir = self._round_ckpt_dir()
        if ckpt_dir:
            freq = max(int(self.cfg.TRAIN.CHECKPOINT_FREQ), 1)
            due = (epoch + 1 >= max_epoch or (epoch + 1) % freq == 0)
            if due:
                path = self.save_round_state(ckpt_dir, epoch,
                                             state=handle["state"],
                                             lr_steps=handle["lr_steps"])
                print(f"round state -> {path}")
                self._prune_round_ckpts(ckpt_dir, keep=epoch)
        return ms

    def _agg_fn(self, mode: str, has_group_w: bool):
        """Jitted aggregation + personalization program, cached per mode.
        Index/mask arrays enter as ARGUMENTS — closing over device arrays
        would embed them as constants and re-trace every round."""
        key = (mode, has_group_w)
        if key in self._agg_fns:
            return self._agg_fns[key]
        G = self.num_groups
        avg_prompt = self.avg_prompt
        local_s = self.local_s and mode in ("ema_personal", "fedavg_personal")
        # the reference's shared_half_s is inside the SAME
        # by-attr-and-shape guard as group weighting (fed_utils.py:91): no
        # group weights (DISABLE_ATTR, or an observed-histogram width that
        # mismatches lora_S's group dim) also means no half-S sharing
        shared_half_s = (self.shared_half_s and mode == "ema_personal"
                         and has_group_w)

        def agg_impl(trained_t, global_t, personal_t, weights, group_w,
                     beta_decay, idx_arr, update_idx, keep_mask):
            def wmean(path, x):
                x32 = x.astype(jnp.float32)
                if (group_w is not None and "lora_S" in path
                        and x.ndim >= 3 and x.shape[-2] == G):
                    w = group_w.reshape(
                        (x.shape[0],) + (1,) * (x.ndim - 3) + (G, 1))
                    return (x32 * w).sum(0)
                w = weights.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
                return (x32 * w).sum(0)

            flat = flatten_paths(trained_t)

            if mode == "prompt_personal":
                # PromptFL/FedOTP: aggregate ONLY the global prompt rows
                # (reference federated_main.py:447-485); everything else stays
                # per-client.
                ctx_key = next(k for k in flat
                               if k.endswith("prompt_learner.ctx"))
                ctx = flat[ctx_key]  # [m, n_prompt, n_ctx, d]
                w = weights.reshape((ctx.shape[0],) + (1,) * (ctx.ndim - 1))
                avg_rows = (ctx[:, :avg_prompt].astype(jnp.float32)
                            * w).sum(0)  # [avg_prompt, n_ctx, d]

                def personalize_p(path, p, g):
                    tr = flat[path]
                    if path == ctx_key:
                        out = p.at[:, :avg_prompt].set(
                            jnp.broadcast_to(
                                avg_rows[None],
                                (p.shape[0],) + avg_rows.shape).astype(p.dtype))
                        return out.at[idx_arr, avg_prompt:].set(
                            tr[:, avg_prompt:].astype(p.dtype))
                    # non-prompt trainables: trained clients keep theirs
                    return p.at[idx_arr].set(tr.astype(p.dtype))

                def glob_p(path, g):
                    if path == ctx_key:
                        return g.at[:avg_prompt].set(avg_rows.astype(g.dtype))
                    return g

                flat_g = flatten_paths(global_t)
                new_global = _unflatten_like(
                    global_t, {k: glob_p(k, v) for k, v in flat_g.items()})
                new_personal = _map2_with_path(
                    personalize_p, personal_t, new_global)
                return new_global, new_personal

            if mode == "local_personal":
                # no aggregation (reference federated_main.py:728-773's
                # ``local`` branch): each trained client simply keeps its own
                # full trainable; the global model is untouched
                def personalize_l(path, p, g):
                    return p.at[idx_arr].set(flat[path].astype(p.dtype))

                new_personal = _map2_with_path(
                    personalize_l, personal_t, global_t)
                return global_t, new_personal

            avg = _unflatten_like(global_t,
                                  {k: wmean(k, v) for k, v in flat.items()})
            if shared_half_s:
                # NOT fed.parallel.apply_shared_half_s: its map_with_path
                # rebuilds RN trees with lists coerced to other containers,
                # breaking the tree_map against global_t below — aggregation
                # rebuilds must go flatten_paths -> unflatten_like (CLAUDE.md)
                def half_s(path, x):
                    if "lora_S" in path and x.ndim >= 2 and x.shape[-2] == G:
                        r = x.shape[-1]
                        head = x[..., : r // 2].mean(axis=-2, keepdims=True)
                        head = jnp.broadcast_to(head, x[..., : r // 2].shape)
                        return jnp.concatenate([head, x[..., r // 2:]], axis=-1)
                    return x
                flat_a = flatten_paths(avg)
                avg = _unflatten_like(
                    avg, {k: half_s(k, v) for k, v in flat_a.items()})
            if mode == "ema_personal":
                new_global = jax.tree_util.tree_map(
                    lambda a, g: ((1.0 - beta_decay) * a
                                  + beta_decay * g.astype(jnp.float32)
                                  ).astype(g.dtype), avg, global_t)
            else:  # plain FedAvg
                new_global = jax.tree_util.tree_map(
                    lambda a, g: a.astype(g.dtype), avg, global_t)

            # personalization (reference federated_main.py:645-652): rows in
            # update_idx take the new global; trained clients flagged in
            # keep_mask then restore their local prompt rows (+ local lora_S)
            def personalize(path, p, g):
                out = p.at[update_idx].set(
                    jnp.broadcast_to(g[None], (update_idx.shape[0],) + g.shape
                                     ).astype(p.dtype))
                if mode == "fedavg":
                    return out
                tr = flat[path]
                if path.endswith("prompt_learner.ctx"):
                    if mode == "fedavg_personal":
                        # ungated: every update user keeps its OWN previous
                        # local rows; trained users then get this round's
                        out = out.at[update_idx, avg_prompt:].set(
                            p[update_idx][:, avg_prompt:].astype(p.dtype))
                        return out.at[idx_arr, avg_prompt:].set(
                            tr[:, avg_prompt:].astype(p.dtype))
                    rows = tr[:, avg_prompt:].astype(p.dtype)
                    keep = keep_mask.reshape((-1,) + (1,) * (rows.ndim - 1))
                    cur = out[idx_arr][:, avg_prompt:]
                    return out.at[idx_arr, avg_prompt:].set(
                        jnp.where(keep, rows, cur))
                if local_s and "lora_S" in path:
                    if mode == "fedavg_personal":
                        out = out.at[update_idx].set(
                            p[update_idx].astype(p.dtype))
                        return out.at[idx_arr].set(tr.astype(p.dtype))
                    keep = keep_mask.reshape((-1,) + (1,) * (tr.ndim - 1))
                    return out.at[idx_arr].set(
                        jnp.where(keep, tr.astype(p.dtype), out[idx_arr]))
                return out

            new_personal = _map2_with_path(personalize, personal_t, new_global)
            return new_global, new_personal

        def fused(trained_t, global_t, personal_t, stacked_o, trained_o,
                  weights, group_w, beta_decay, idx_arr, update_idx,
                  keep_mask):
            # aggregation + personalization + optimizer-state scatter as ONE
            # program: each extra dispatch costs a tunnel round-trip
            new_global, new_personal = agg_impl(
                trained_t, global_t, personal_t, weights, group_w, beta_decay,
                idx_arr, update_idx, keep_mask)
            new_o = jax.tree_util.tree_map(
                lambda full, sub: full.at[idx_arr].set(sub.astype(full.dtype)),
                stacked_o, trained_o)
            return new_global, new_personal, new_o

        if has_group_w:
            fn = jax.jit(fused)
        else:
            fn = jax.jit(lambda t, g, p, so, to, w, bd, ia, ui, km: fused(
                t, g, p, so, to, w, None, bd, ia, ui, km))
        self._agg_fns[key] = fn
        return fn

    # ------------------------------------------------------------- eval
    def _ensure_eval_cache(self, idx: int):
        """Device-resident decoded TEST set for client ``idx`` (labels/attrs
        stay host numpy for the evaluator).  None when the pipeline transforms
        on host, iterates through a sampler (cache is index-ordered), or the
        set exceeds the cache cap."""
        if idx in self._eval_cache:
            return self._eval_cache[idx]
        decoded = self._decode_loader(self.trainer.fed_test_loader_x_dict[idx])
        if decoded is None:
            self._eval_cache[idx] = None
            return None
        imgs, labels, attrs = decoded
        self._cached_bytes += imgs.nbytes
        cache = {
            "img": jax.device_put(imgs),
            "label": labels,
            "attrs": attrs,
            "attr_dev": (jax.device_put(attrs[:, self._attr_col])
                         if attrs is not None and self._attr_col is not None
                         else None),
        }
        self._eval_cache[idx] = cache
        return cache

    def _eval_program(self, with_attr: bool):
        """ONE jitted program for the whole eval dispatch: client-row gather
        from the stacked personal trees, per-client batch gathers from the
        device caches, and the scanned/vmapped logits — eager per-client
        indexing would cost a tunnel round-trip per op."""
        key = ("eval", with_attr)
        if key in self._agg_fns:
            return self._agg_fns[key]
        infer = self.trainer.make_parallel_infer()

        @jax.jit
        def run(personal_t, idx_arr, frozen, img_caches, attr_caches, mats):
            stacked_t = jax.tree_util.tree_map(lambda x: x[idx_arr], personal_t)
            imgs = jnp.stack([c[mats[j]] for j, c in enumerate(img_caches)])

            def per_client(t, imgs_c, attrs_c):
                def body(_, xs):
                    img, at = xs
                    return None, infer(t, frozen, img, at)
                _, logits = jax.lax.scan(body, None, (imgs_c, attrs_c))
                return logits

            attrs = jnp.stack([c[mats[j]] for j, c in enumerate(attr_caches)])
            return jax.vmap(per_client)(stacked_t, imgs, attrs)

        @jax.jit
        def run_no_attr(personal_t, idx_arr, frozen, img_caches, mats):
            stacked_t = jax.tree_util.tree_map(lambda x: x[idx_arr], personal_t)
            imgs = jnp.stack([c[mats[j]] for j, c in enumerate(img_caches)])

            def per_client(t, imgs_c):
                def body(_, img):
                    return None, infer(t, frozen, img, None)
                _, logits = jax.lax.scan(body, None, imgs_c)
                return logits

            return jax.vmap(per_client)(stacked_t, imgs)

        fn = run if with_attr else run_no_attr
        self._agg_fns[key] = fn
        return fn

    def parallel_eval(self, idxs_users: Sequence[int], current_epoch: int):
        """Evaluate every listed client through ONE jitted program (scan over
        padded test batches, vmapped over clients), then run each client's
        evaluator on host from a single logits fetch.  Output format matches
        ``SimpleTrainer.test`` line for line.  Returns None when any client
        lacks a device eval cache (caller falls back to the sequential loop).
        """
        idxs_users = [int(i) for i in idxs_users]
        pending = getattr(self, "_pending_eval", None)
        if pending is not None and pending["idxs"] == idxs_users \
                and pending.get("epoch") == current_epoch:
            # dispatched inside run_round(current_epoch), overlapping the
            # metrics fetch — the logits may already be computed.  The epoch
            # check keeps an out-of-order deferred caller from receiving a
            # DIFFERENT round's logits labeled as this one's; a mismatched
            # pending is left un-consumed and this call evaluates the
            # runner's current state instead (the non-pipelined semantic).
            self._pending_eval = None
            ctx = pending
        else:
            ctx = self._eval_dispatch(idxs_users)
        if ctx is None:
            return None
        return self._eval_finish(ctx, current_epoch)

    def _eval_dispatch(self, idxs_users):
        """Assemble the batched eval inputs and DISPATCH the logits program
        (no host sync).  Returns an opaque context for :meth:`_eval_finish`,
        or None when any client lacks a device eval cache."""
        import time as _time
        timing = os.environ.get("FAIRFEDMED_TIMING") == "1"
        tick = _time.perf_counter
        t0 = tick()

        stamp("eval:dispatch_start")
        caches = [self._ensure_eval_cache(i) for i in idxs_users]
        if not caches or any(c is None for c in caches):
            return None
        # attr presence must be uniform: the eval program stacks attr batches
        # positionally against imgs, so a mixed set would misalign clients
        has_attr = [c["attr_dev"] is not None for c in caches]
        if any(has_attr) and not all(has_attr):
            return None
        trainer = self.trainer
        bs = self.cfg.DATALOADER.TEST.BATCH_SIZE
        mats, n_valids = [], []
        for c in caches:
            n = c["label"].shape[0]
            rows, valid = [], []
            for start in range(0, n, bs):
                chunk = np.arange(start, min(start + bs, n))
                valid.append(len(chunk))
                rows.append(np.resize(chunk, bs))  # loader's pad_final rule
            mats.append(np.stack(rows))
            n_valids.append(valid)
        S = max(m.shape[0] for m in mats)
        padded = []
        for mat in mats:
            if mat.shape[0] < S:
                mat = np.concatenate(
                    [mat, np.repeat(mat[:1], S - mat.shape[0], axis=0)])
            padded.append(mat)
        mats_dev = jnp.asarray(np.stack(padded), jnp.int32)  # [m, S, bs]
        idx_arr = jnp.asarray(np.asarray(idxs_users, np.int32))

        with_attr = all(has_attr)
        if with_attr:
            logits = self._eval_program(True)(
                self.personal_t, idx_arr, trainer.frozen,
                tuple(c["img"] for c in caches),
                tuple(c["attr_dev"] for c in caches), mats_dev)
        else:
            logits = self._eval_program(False)(
                self.personal_t, idx_arr, trainer.frozen,
                tuple(c["img"] for c in caches), mats_dev)
        if timing:
            print(f"[timing] eval assemble+dispatch: {tick() - t0:.3f}s")
        return {"idxs": list(idxs_users), "logits": logits, "caches": caches,
                "mats": mats, "n_valids": n_valids}

    def _eval_finish(self, ctx, current_epoch: int):
        """Fetch the dispatched logits (one transfer) and run each client's
        evaluator on host."""
        import time as _time
        timing = os.environ.get("FAIRFEDMED_TIMING") == "1"
        tick = _time.perf_counter
        t0 = tick()

        trainer = self.trainer
        idxs_users = ctx["idxs"]
        caches, mats, n_valids = ctx["caches"], ctx["mats"], ctx["n_valids"]
        logits_np = ctx.get("logits_host")  # pre-fetched with the metrics
        if logits_np is None:
            logits_np = np.asarray(ctx["logits"], np.float32)  # ONE fetch
        if timing:
            print(f"[timing] eval logits fetch: {tick() - t0:.3f}s")
            t0 = tick()

        results = []
        for j, idx in enumerate(idxs_users):
            c = caches[j]
            trainer.evaluator.reset()
            print(f"Evaluate on the client{idx}_test set")
            mat, valid = mats[j], n_valids[j]
            for row in range(mat.shape[0]):
                nv = valid[row]
                rows_idx = mat[row, :nv]
                out = logits_np[j, row, :nv]
                label_h = c["label"][rows_idx]
                attrs_h = (c["attrs"][rows_idx].T
                           if c["attrs"] is not None else None)
                trainer.evaluator.process(out, label_h, attrs_h)
            res = trainer.evaluator.evaluate()
            for k, v in res.items():
                if np.isscalar(v):
                    trainer.write_scalar(f"test/{k}/{idx}", v, current_epoch)
            results.append(list(res.values()))
        if timing:
            print(f"[timing] eval host metrics: {tick() - t0:.3f}s")
        return results

    # ------------------------------------------------------------- save
    def _run_fingerprint(self) -> int:
        """Stable id of the run shape a round checkpoint belongs to: restoring
        into a different model/user-count is either an opaque Orbax structure
        error or silent weight adoption — both worse than a clean restart."""
        import zlib

        key = "|".join([str(self.num_users), str(self.args.model),
                        str(self.cfg.TRAINER.NAME),
                        str(self.cfg.MODEL.BACKBONE.NAME),
                        # dataset identity: same model shape trained on a
                        # different dataset/modality/attribute MUST NOT be
                        # silently adopted (trainable shapes can be identical
                        # between e.g. slo_fundus and oct_bscans runs)
                        str(self.cfg.DATASET.NAME),
                        str(self.cfg.DATASET.MODALITY_TYPE),
                        str(getattr(self.args, "attribute_type", ""))])
        return zlib.crc32(key.encode())

    def _run_fingerprint_legacy(self) -> int:
        """The pre-dataset-identity fingerprint (users/model/trainer/backbone
        only).  Checkpoints written before the dataset fields were added to
        :meth:`_run_fingerprint` carry this value; they are still accepted —
        with a printed caveat — so a long preemptible run is not silently
        restarted from epoch 0 by a mid-run code upgrade."""
        import zlib

        key = "|".join([str(self.num_users), str(self.args.model),
                        str(self.cfg.TRAINER.NAME),
                        str(self.cfg.MODEL.BACKBONE.NAME)])
        return zlib.crc32(key.encode())

    def save_round_state(self, directory: str, epoch: int,
                         state=None, lr_steps=None) -> str:
        """Checkpoint the device-resident federated state — global + stacked
        per-client trainables, per-client optimizer states, and the LR step
        counter — as ONE Orbax pytree (train/checkpoint.py).  Beyond-reference
        capability: the reference ships resume disabled (trainer.py:435-436)
        and keeps no mid-run federated state at all; here a long run on a
        preemptible TPU can continue from the last round.

        ``state``/``lr_steps`` override the live attributes: a DEFERRED round
        resolves after the next round has dispatched, when self.* already
        holds the newer arrays (run_round snapshots them into the handle)."""
        from ..train.checkpoint import save_pytree

        g, p, o = state if state is not None else (
            self.global_t, self.personal_t, self.stacked_o)
        tree = {"global_t": g, "personal_t": p, "stacked_o": o,
                "lr_steps": int(self.trainer._lr_steps
                                if lr_steps is None else lr_steps),
                "epoch": int(epoch),
                "fingerprint": self._run_fingerprint()}
        path = save_pytree(directory, tree, step=epoch)
        self._saved_steps.add(epoch)
        return path

    def _prune_round_ckpts(self, directory: str, keep: int) -> None:
        """Delete step_N checkpoints THIS RUN wrote, except ``keep``
        (retention 1).  Steps the runner did not create — another
        experiment's checkpoints in a shared directory — are left alone."""
        import shutil

        for step in list(self._saved_steps):
            if step != keep:
                shutil.rmtree(os.path.join(directory, f"step_{step}"),
                              ignore_errors=True)
                self._saved_steps.discard(step)

    def _round_ckpt_dir(self):
        """Round-state checkpoint directory: the FAIRFEDMED_ROUND_CKPT env var
        overrides ``--resume DIR`` (reference federated_main.py:863 parses
        --resume but ships the resume call disabled,
        Dassl/dassl/engine/trainer.py:435-436; here the flag is live)."""

        return (os.environ.get("FAIRFEDMED_ROUND_CKPT")
                or (self.cfg.RESUME or None))

    def maybe_resume(self) -> int:
        """If the round-checkpoint dir (--resume / FAIRFEDMED_ROUND_CKPT)
        holds a saved round OF THIS RUN SHAPE (fingerprint: users/model/
        trainer/backbone + dataset/modality/attribute; pre-dataset-identity
        checkpoints are accepted with a printed caveat), restore it and
        return the epoch to CONTINUE from (saved epoch + 1); else 0.  Client-sampling RNG state is
        not restored — frac-sampled rounds after a resume draw a fresh subset,
        like restarting the reference mid-run would."""

        ckpt_dir = self._round_ckpt_dir()
        if not ckpt_dir:
            return 0
        from ..train.checkpoint import latest_step

        step = latest_step(ckpt_dir)
        if step is None:
            return 0
        try:
            epoch = self.load_round_state(os.path.join(ckpt_dir, f"step_{step}"))
        except Exception as e:  # stale/foreign checkpoint: start fresh
            print(f"ignoring round checkpoint {ckpt_dir}/step_{step}: {e}")
            return 0
        # adopt the resumed lineage so retention prunes it after the next save
        self._saved_steps.add(step)
        print(f"resumed round state from {ckpt_dir}/step_{step} "
              f"(continuing at epoch {epoch + 1})")
        return epoch + 1

    def load_round_state(self, path: str) -> int:
        """Restore :meth:`save_round_state` output; returns the saved epoch
        (resume from epoch+1)."""
        from ..train.checkpoint import load_pytree

        template = {"global_t": self.global_t, "personal_t": self.personal_t,
                    "stacked_o": self.stacked_o, "lr_steps": 0, "epoch": 0,
                    "fingerprint": 0}
        tree = load_pytree(path, template=template)
        fp = int(tree["fingerprint"])
        if fp != self._run_fingerprint():
            if fp == self._run_fingerprint_legacy():
                # written before dataset identity joined the fingerprint:
                # the run shape matches on users/model/trainer/backbone but
                # the checkpoint cannot prove its dataset — accept (a code
                # upgrade must not discard a long run's rounds) and say so
                print("note: round checkpoint has a pre-dataset-identity "
                      "fingerprint (users/model/trainer/backbone match; "
                      "dataset/modality/attribute unverified) — resuming")
            else:
                raise ValueError(
                    "round checkpoint belongs to a different run shape "
                    "(users/model/trainer/backbone or dataset/modality/"
                    "attribute mismatch)")
        self.global_t = tree["global_t"]
        self.personal_t = tree["personal_t"]
        self.stacked_o = tree["stacked_o"]
        self.trainer._lr_steps = int(tree["lr_steps"])
        return int(tree["epoch"])

    def _gather_rows(self, tree, idx):
        """ONE jitted dispatch gathering ``idx`` rows (scalar or vector) from
        a stacked tree — shared by batched eval and install_client."""
        if "gather_t" not in self._agg_fns:
            self._agg_fns["gather_t"] = jax.jit(
                lambda t, i: jax.tree_util.tree_map(lambda x: x[i], t))
        return self._agg_fns["gather_t"](tree, idx)

    def install_client(self, idx: int):
        """Point the trainer's trainable at client ``idx``'s personalized tree
        (stays on device — used for eval and final state export).  Uses the
        cached jitted gather so the pull is ONE dispatch, not one per leaf."""
        row = self._gather_rows(self.personal_t,
                                jnp.asarray(int(idx), jnp.int32))
        if hasattr(self.trainer, "adopt_parallel_trainable"):
            self.trainer.adopt_parallel_trainable(row)
        else:
            self.trainer.trainable = row

    def final_state_dict(self, idx: int) -> dict:
        self.install_client(idx)
        return self.trainer.state_dict()
