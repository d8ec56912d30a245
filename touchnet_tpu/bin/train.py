# Copyright (c) 2026 touchnet_tpu authors.
# The training binary: single-file exposed train loop.
#
# Capability parity: reference touchnet/bin/train.py:42-648 (Trainer with
# init / train / train_step / dev, telemetry, checkpoint cadence, profiling).
# TPU-first re-design (SURVEY.md §7):
#   - single-controller SPMD: one process drives the whole
#     [pp, dp_replicate, dp_shard, cp, tp] mesh; the "global batch" is
#     assembled from the per-dp-rank loader streams (identical order to the
#     reference's per-rank loaders) and device_put with (dp, cp) sharding;
#   - one jitted train_step: forward (Pallas packed attention via shard_map)
#     + pack loss + grad clip + AdamW update, params donated, XLA inserts
#     every collective (FSDP all-gather/reduce-scatter, TP, loss-parallel);
#   - grad-scale semantics: the objective is global_sum/global_num_sentence —
#     the true packed per-sample mean. (The reference's FSDP mean-reduce adds
#     an extra 1/dp factor to effective grads; we implement the exact
#     objective instead.)

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from touchnet_tpu.bin import TrainConfig
from touchnet_tpu.data import DataConfig
from touchnet_tpu.parallel.context_parallel import make_sharded_attn_fn
from touchnet_tpu.parallel.dims import ParallelDims
from touchnet_tpu.parallel.sharding import (
    batch_specs,
    microbatch_specs,
    make_shard_fn,
    named_shardings,
)
from touchnet_tpu.tokenizer import TokenizerConfig
from touchnet_tpu.utils.checkpoint import CheckpointManager, export_weights_only
from touchnet_tpu.utils.cli import dump_config_json, parse_args_into_dataclasses
from touchnet_tpu.utils.distributed import (
    GarbageCollection,
    init_distributed,
    set_determinism,
)
from touchnet_tpu.utils.logging import init_logger, logger
from touchnet_tpu.utils.metrics import build_metrics_processor
from touchnet_tpu.utils.optimizer import build_lr_schedule, build_optimizer
from touchnet_tpu.utils.profiling import (
    maybe_enable_memory_snapshot,
    maybe_enable_profiling,
)
from touchnet_tpu.utils.train_spec import get_train_spec

_BATCH_ARRAY_KEYS = (
    "input_ids",
    "inputs_embeds",
    "input_features",
    "labels",
    "shift_labels",
    "position_ids",
    "attention_mask",
    "feature_attention_mask",
    "sentence_lens",
    "text_input_ids",
    "audio_input_ids",
    "whisper_input_features",
    "whisper_attention_mask",
)


def _assert_params_finite(params) -> None:
    """Post-init/post-load NaN/inf sweep over every float parameter leaf
    (reference models/llama/__init__.py:33-36 raises per offending name).
    ONE jitted tree-reduce for the whole tree — a per-leaf jit would pay
    hundreds of tiny compilations on a 7B startup path."""
    with_path = [
        (path, leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
    ]
    if not with_path:
        return
    flags = jax.jit(
        lambda leaves: jnp.stack([jnp.isfinite(x).all() for x in leaves])
    )([leaf for _, leaf in with_path])
    bad = [
        jax.tree_util.keystr(path)
        for (path, _), ok in zip(with_path, np.asarray(flags))
        if not ok
    ]
    if bad:
        raise ValueError(f"NaN/inf in model parameters: {bad[:5]}")


class GlobalBatchLoader:
    """Assembles the global batch from per-dp-rank loader streams.

    Reference semantics: each dp rank has its own stateful loader
    (touchnet/data/dataloader.py). Under one controller we instantiate all
    dp_degree streams and concatenate along batch, so sample order per rank
    is bit-identical to the reference layout; state is the union of the
    per-rank states.

    Multi-host: each process instantiates only the dp-rank streams it is
    responsible for (`dp_ranks`); the trainer turns the process-local
    concatenation into a global array with
    jax.make_array_from_process_local_data."""

    def __init__(self, build_fn, data_config, tokenizer, dp_degree: int,
                 split: str, dp_ranks=None):
        self.dp_degree = dp_degree
        self.dp_ranks = list(range(dp_degree)) if dp_ranks is None else list(dp_ranks)
        self.loaders = [
            build_fn(data_config, tokenizer, r, dp_degree, split)
            for r in self.dp_ranks
        ]

    def __iter__(self):
        iters = [iter(ld) for ld in self.loaders]
        while True:
            parts = []
            for it in iters:
                try:
                    parts.append(next(it))
                except StopIteration:
                    return
            batch: Dict[str, Any] = {}
            for key in parts[0]:
                vals = [p[key] for p in parts]
                if key == "num_sentence":
                    batch[key] = int(sum(vals))
                elif vals[0] is None:
                    batch[key] = None
                elif isinstance(vals[0], np.ndarray):
                    batch[key] = np.concatenate(vals, axis=0)
                else:
                    batch[key] = vals
            yield batch

    def state_dict(self):
        state = {}
        for ld in self.loaders:
            state.update(ld.state_dict())
        state["world_size"] = self.dp_degree
        return state

    @staticmethod
    def local_dp_ranks(parallel_dims, mesh):
        """dp ranks whose batch shards live on this process's devices."""
        if jax.process_count() == 1:
            return None
        import numpy as np

        local = set()
        devs = mesh.devices  # [pp, dp_replicate, dp_shard, cp, tp]
        for idx in np.ndindex(devs.shape):
            if devs[idx].process_index == jax.process_index():
                local.add(idx[1] * parallel_dims.dp_shard + idx[2])
        return sorted(local)

    def load_state_dict(self, state):
        for ld in self.loaders:
            ld.load_state_dict(state)

    def get_epoch(self):
        return min(ld.get_epoch() for ld in self.loaders)

    def shutdown(self):
        for ld in self.loaders:
            ld.shutdown()


class DevicePrefetcher:
    """Stages the next global batch on device while the current step runs
    (reference: pin_memory + prefetch in torchdata; here jax.device_put
    double buffering via a background thread).

    Exact-resume: the loader's state advances as the FILL thread pulls, so
    each staged item carries the loader-state snapshot taken right after its
    pull; `consumed_state` always reflects the last batch handed to the
    TRAINING loop — a checkpoint never skips device-staged-but-untrained
    batches."""

    def __init__(self, loader, put_fn, depth: int = 2):
        import copy
        import queue
        import threading

        self.put_fn = put_fn
        self.queue = queue.Queue(maxsize=max(1, depth))
        self.error = None
        self._done = object()
        self.consumed_state = copy.deepcopy(loader.state_dict())

        def fill():
            try:
                for batch in loader:
                    state = copy.deepcopy(loader.state_dict())
                    self.queue.put((self.put_fn(batch), state))
            except BaseException as e:  # surfaced on next()
                self.error = e
            finally:
                self.queue.put(self._done)

        self.thread = threading.Thread(target=fill, daemon=True)
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.queue.get()
        if item is self._done:
            if self.error is not None:
                raise self.error
            raise StopIteration
        staged, state = item
        self.consumed_state = state
        return staged


class _AccumBatcher:
    """Gradient-accumulation loader facade: pulls G host batches and stacks
    every array to [G, B, ...] — the microbatch axis the jitted train step's
    lax.scan consumes — summing num_sentence so each microbatch loss
    normalizes by the GLOBAL sentence count (the property that makes the
    accumulated grads exactly equal the G*B-batch grads). state_dict reads
    through to the real loader: a checkpoint taken after a stacked group
    resumes at the next group (the reference leaves accumulation as a TODO,
    touchnet/bin/train.py:322)."""

    def __init__(self, loader, accum: int):
        self.loader = loader
        self.accum = accum
        self.loaders = loader.loaders

    def __iter__(self):
        it = iter(self.loader)
        while True:
            parts = []
            for _ in range(self.accum):
                try:
                    parts.append(next(it))
                except StopIteration:
                    # drop a trailing partial group: the optimizer step must
                    # always sum exactly `accum` microbatches
                    return
            batch: Dict[str, Any] = {}
            for key in parts[0]:
                vals = [p[key] for p in parts]
                if key == "num_sentence":
                    batch[key] = int(sum(vals))
                elif vals[0] is None:
                    batch[key] = None
                elif isinstance(vals[0], np.ndarray):
                    try:
                        batch[key] = np.stack(vals, axis=0)
                    except ValueError as e:
                        raise ValueError(
                            "gradient accumulation requires static batch "
                            f"shapes; key `{key}` varies across microbatches "
                            f"({[v.shape for v in vals]}) — dynamic-batch "
                            "datapipes are unsupported with "
                            "training_gradient_accumulation_steps > 1"
                        ) from e
                else:
                    batch[key] = vals
            yield batch

    def state_dict(self):
        return self.loader.state_dict()

    def load_state_dict(self, state):
        self.loader.load_state_dict(state)

    def get_epoch(self):
        return self.loader.get_epoch()

    def shutdown(self):
        self.loader.shutdown()


class _PrefetchStateView:
    """Dataloader facade for the CheckpointManager during training: reads
    the DevicePrefetcher's consumed-state, writes to the real loader."""

    def __init__(self, prefetcher, loader):
        self.prefetcher = prefetcher
        self.loader = loader

    def state_dict(self):
        return self.prefetcher.consumed_state

    def load_state_dict(self, state):
        self.loader.load_state_dict(state)


class Trainer:
    def __init__(
        self,
        tokenizer_config: TokenizerConfig,
        data_config: DataConfig,
        job_config: TrainConfig,
    ):
        self.job_config = job_config
        self.data_config = data_config
        self.tokenizer_config = tokenizer_config
        job_config.validate()
        self.gc_handler = GarbageCollection(job_config.training_gc_freq)

        self.parallel_dims = ParallelDims(
            dp_replicate=job_config.training_data_parallel_replicate_degree,
            dp_shard=job_config.training_data_parallel_shard_degree,
            cp=job_config.training_context_parallel_degree,
            tp=job_config.training_tensor_parallel_degree,
            pp=job_config.training_pipeline_parallel_degree,
            enable_loss_parallel=job_config.training_enable_loss_parallel,
        )
        self._accum = job_config.training_gradient_accumulation_steps
        init_distributed(job_config)
        init_logger(
            os.path.join(job_config.training_trace_dump_folder, "touchnet_train.log")
        )
        self.mesh = self.parallel_dims.build_mesh()
        logger.info(f"job: {job_config.training_description}")
        if job_config.training_print_args:
            for cfg_obj in (tokenizer_config, data_config, job_config):
                logger.info(f"{type(cfg_obj).__name__}: {cfg_obj}")
        logger.info(
            f"mesh: {dict(self.mesh.shape)} on {jax.device_count()} "
            f"{jax.devices()[0].device_kind} devices"
        )
        if job_config.training_enable_compiled_autograd:
            logger.info(
                "compiled_autograd: no-op on TPU (the backward pass is "
                "always part of the jitted train step)"
            )
        self.prng = set_determinism(
            job_config.training_seed, job_config.training_deterministic
        )

        self.train_spec = get_train_spec(job_config.training_model_name)
        if self.parallel_dims.pp_enabled:
            from touchnet_tpu.parallel.pipeline import validate_pp_composition

            validate_pp_composition(self.parallel_dims, job_config)
            assert self.train_spec.pipelining_fn is not None, (
                f"{self.train_spec.name} has no pipeline-parallel support "
                "(llama and touch_audio register a pipelining_fn; the "
                "reference pipelines only llama)"
            )
        if self.train_spec.dp_only:
            assert not (
                self.parallel_dims.tp_enabled
                or self.parallel_dims.cp_enabled
                or self.parallel_dims.pp_enabled
            ), f"{self.train_spec.name} supports FSDP/HSDP/DDP only"
        if self.train_spec.additional_pre_init_fn is not None:
            self.train_spec.additional_pre_init_fn(job_config)
        self.model_config = self.train_spec.config_cls.from_json_file(
            job_config.training_model_config_path
        )

        # dump configs into the experiment dir (reference train.py:133-141)
        dump_dir = job_config.training_trace_dump_folder
        for name, cfg in (
            ("tokenizer_config", tokenizer_config),
            ("data_config", data_config),
            ("train_config", job_config),
        ):
            dump_config_json(cfg, os.path.join(dump_dir, f"{name}.json"))

        self.tokenizer = self.train_spec.build_tokenizer_fn(tokenizer_config)
        self._local_dp_ranks = GlobalBatchLoader.local_dp_ranks(
            self.parallel_dims, self.mesh
        )
        self.dataloader = GlobalBatchLoader(
            self.train_spec.build_dataloader_fn,
            data_config,
            self.tokenizer,
            self.parallel_dims.dp_degree,
            "train",
            dp_ranks=self._local_dp_ranks,
        )
        self.has_dev = data_config.datalist_dev_path is not None

        self.metrics_processor = (
            self.train_spec.build_metrics_processor_fn
            or build_metrics_processor
        )(job_config, self.parallel_dims)

        # ---- sharded init (the meta-device analog: eval_shape + jit with
        # out_shardings, so a 7B model never materializes on one host) ----
        init_key, self.prng = jax.random.split(self.prng)
        abstract = jax.eval_shape(
            lambda k: self.train_spec.init_params_fn(self.model_config, k), init_key
        )
        rules = self.train_spec.param_rules
        if self.parallel_dims.pp_enabled:
            from touchnet_tpu.models.llama.pipeline_llama import pp_param_rules
            from touchnet_tpu.parallel.sharding import LLAMA_PARAM_RULES

            rules = pp_param_rules(rules if rules is not None else LLAMA_PARAM_RULES)
        self.param_shardings = named_shardings(abstract, self.mesh, rules)
        with self.mesh:
            self.params = jax.jit(
                lambda k: self.train_spec.init_params_fn(self.model_config, k),
                out_shardings=self.param_shardings,
            )(init_key)
        if self.train_spec.additional_post_init_fn is not None:
            self.params = (
                self.train_spec.additional_post_init_fn(
                    self.params, self.model_config
                )
                or self.params
            )

        num_params = self.train_spec.get_num_params_fn(self.model_config)
        num_params_wo_emb = self.train_spec.get_num_params_fn(
            self.model_config, exclude_embedding=True
        )
        seq_len = (
            data_config.dataset_text_seqlen
            if data_config.datapipe_type == "causal_lm"
            else data_config.dataset_audio_seqlen
        )
        # flops use the embedding-free count (reference train.py:190-196)
        self.num_flop_per_token = self.train_spec.get_num_flop_per_token_fn(
            num_params_wo_emb, self.model_config, seq_len
        )
        self.metrics_processor.num_flop_per_token = self.num_flop_per_token
        logger.info(
            f"model {self.train_spec.name}: {num_params / 1e6:.1f}M params, "
            f"{self.num_flop_per_token / 1e9:.2f} GFLOP/token"
        )

        bundle = build_optimizer(job_config)
        self.opt_bundle = bundle
        self.tx, self.schedule = bundle.tx, bundle.schedule
        # moment trees inherit the param shardings via propagation; scalar
        # leaves (step counts) are pinned replicated so restored checkpoints
        # stay mesh-consistent
        abstract_opt = jax.eval_shape(self.tx.init, abstract)
        from jax.sharding import NamedSharding, PartitionSpec

        opt_out_shardings = jax.tree.map(
            lambda l: NamedSharding(self.mesh, PartitionSpec())
            if l.ndim == 0
            else None,
            abstract_opt,
        )
        with self.mesh:
            self.opt_state = jax.jit(
                self.tx.init, out_shardings=opt_out_shardings
            )(self.params)
        if job_config.training_enable_cpu_offload:
            # optimizer state lives in host memory (reference
            # CPUOffloadPolicy, helper_func.py:160); XLA streams it per step
            def host(x):
                try:
                    return jax.device_put(
                        x, x.sharding.with_memory_kind("pinned_host")
                    )
                except Exception:  # backend without host memory kinds
                    logger.warning("pinned_host memory unavailable; "
                                   "cpu offload disabled")
                    return x

            self.opt_state = jax.tree.map(host, self.opt_state)

        self.checkpointer = CheckpointManager(self.dataloader, job_config)
        loaded = self.checkpointer.load(self.params, self.opt_state)
        self.params = loaded["params"]
        self.opt_state = loaded["opt_state"]
        self.step = loaded["step"]
        _assert_params_finite(self.params)

        self.train_step_fn = self._build_train_step()
        self.eval_step_fn = self._build_eval_step()
        self.lr_schedule = build_lr_schedule(job_config)

    # ------------------------------------------------------------------
    @property
    def _fused_ce(self) -> bool:
        """Fused linear+CE (parallel/loss_parallel.py): enabled by the liger
        flag (reference train.py:443-445) and implied by loss parallel under
        TP (reference loss_parallel ctx, distributed.py:318-329)."""
        cfg = self.job_config
        wanted = cfg.training_enable_liger_kernel or (
            self.parallel_dims.loss_parallel_enabled
            and self.parallel_dims.tp_enabled
        )
        return (
            wanted
            and self.train_spec.head_weight_fn is not None
            and not self.parallel_dims.pp_enabled
        )

    def _forward_logits(self, params, batch, return_hidden: bool = False):
        cfg = self.job_config
        if self.parallel_dims.pp_enabled:
            import importlib

            mod_path, fn_name = self.train_spec.pipelining_fn.rsplit(".", 1)
            pipeline_forward = getattr(importlib.import_module(mod_path), fn_name)
            extra = {}
            if batch.get("input_features") is not None:
                # multimodal pipelining (touch_audio): fusion runs in the
                # SPMD preamble outside the tick loop
                extra["input_features"] = batch["input_features"]
            return pipeline_forward(
                params,
                input_ids=batch.get("input_ids"),
                segment_ids=batch.get("attention_mask"),
                position_ids=batch.get("position_ids"),
                config=self.model_config,
                mesh=self.mesh,
                n_microbatches=cfg.training_pipeline_parallel_microbatches,
                compute_dtype=_dtype(cfg.training_mixed_precision_param),
                remat_mode=cfg.training_activation_checkpoint_mode,
                schedule=cfg.training_pipeline_parallel_schedule,
                split_points=cfg.training_pipeline_parallel_split_points,
                rotate_method=cfg.training_context_parallel_rotate_method,
                **extra,
            )
        attn_fn = make_sharded_attn_fn(
            self.mesh,
            rotate_method=cfg.training_context_parallel_rotate_method,
        )
        shard_fn = make_shard_fn(
            self.mesh, self.parallel_dims.loss_parallel_enabled
        )
        kwargs = dict(
            segment_ids=batch.get("attention_mask"),
            position_ids=batch.get("position_ids"),
            config=self.model_config,
            compute_dtype=_dtype(cfg.training_mixed_precision_param),
            attn_fn=attn_fn,
            remat_mode=cfg.training_activation_checkpoint_mode,
            shard_fn=shard_fn,
        )
        if cfg.training_activation_checkpoint_mode in ("selective", "op"):
            # "op" + int k = hybrid: op-save k-1 of every k layers,
            # full-remat the k-th (long-context memory dial)
            kwargs["selective_ac_option"] = (
                cfg.training_activation_checkpoint_selective_ac_option
            )
        if return_hidden:
            kwargs["return_hidden"] = True
        for key in self.train_spec.forward_batch_keys:
            if batch.get(key) is not None:
                kwargs[key] = batch[key]
        return self.train_spec.forward_fn(params, **kwargs)

    def _loss_and_acc(self, params, batch, num_sentence):
        """(loss_per_sample, loss_per_token, acc) — fused linear+CE when
        enabled, otherwise full-logits pack loss."""
        if self._fused_ce:
            from touchnet_tpu.parallel.loss_parallel import (
                fused_linear_cross_entropy,
            )

            hidden = self._forward_logits(params, batch, return_hidden=True)
            head_w = self.train_spec.head_weight_fn(params, self.model_config)
            return fused_linear_cross_entropy(
                hidden,
                head_w,
                batch["labels"],
                batch["sentence_lens"],
                num_sentence,
                mesh=self.mesh,
                compute_dtype=_dtype(
                    self.job_config.training_mixed_precision_param
                ),
            )
        logits = self._forward_logits(params, batch)
        loss_ps, loss_pt = self.train_spec.loss_fn(
            logits, batch["labels"], batch["sentence_lens"], num_sentence
        )
        acc = self.train_spec.acc_fn(logits, batch["labels"])
        return loss_ps, loss_pt, acc

    def _maybe_jit(self, fn, **jit_kwargs):
        """training_compile=False runs the step eagerly (op-by-op dispatch;
        debugging aid — the reference's torch.compile toggle analog)."""
        if self.job_config.training_compile:
            return jax.jit(fn, **jit_kwargs)
        logger.warning("training_compile=False: running the step eagerly")
        return fn

    def _value_and_grad(self, loss_fn):
        """Gradient transform honoring training_mixed_precision_reduce:
        'float32' (default) differentiates wrt the fp32 master params, so
        the FSDP grad reduce-scatter runs in fp32; 'bfloat16' differentiates
        wrt bf16 copies of the params — every backward tensor, including the
        cross-shard gradient reduction, stays bf16 (the reference
        MixedPrecisionPolicy reduce_dtype, helper_func.py:160), and grads
        are upcast only at the optimizer boundary."""
        reduce_dtype = _dtype(self.job_config.training_mixed_precision_reduce)
        if reduce_dtype == jnp.float32:
            return jax.value_and_grad(loss_fn, has_aux=True)

        def vg(params, *args):
            low = jax.tree.map(lambda x: x.astype(reduce_dtype), params)
            out, grads = jax.value_and_grad(loss_fn, has_aux=True)(low, *args)
            grads = jax.tree.map(
                lambda g, p: g.astype(p.dtype), grads, params
            )
            return out, grads

        return vg

    def _reshard_policy(self, params):
        """fsdp_reshard_after_forward='never': pin params to a sharding with
        the FSDP axes removed inside the step — one all-gather per step,
        gathered weights stay live through the backward."""
        if self.job_config.training_fsdp_reshard_after_forward != "never":
            return params
        from touchnet_tpu.parallel.sharding import unshard_fsdp

        return jax.lax.with_sharding_constraint(
            params, unshard_fsdp(self.param_shardings, self.mesh)
        )

    def _fused_adamw_enabled(self, frozen_res) -> bool:
        """optimizer_impl fused/foreach -> the single-expression AdamW
        (ops/fused_adamw.py: clip + update + non-finite hold in one fused
        pass per leaf); 'for-loop' keeps the optax chain. Requires the
        recognizable optax.adamw state layout and no frozen params (their
        updates must be zeroed AFTER weight decay). Plain-jnp body, so it
        partitions under GSPMD on any mesh."""
        cfg = self.job_config
        if cfg.optimizer_name != "AdamW" or frozen_res:
            return False
        if cfg.optimizer_impl not in ("fused", "foreach"):
            return False
        try:
            return any(
                isinstance(s, optax.ScaleByAdamState) for s in self.opt_state
            )
        except TypeError:
            return False

    def _build_train_step(self):
        cfg = self.job_config
        tx = self.tx
        max_norm = cfg.training_max_norm

        def loss_fn(params, batch, num_sentence):
            params = self._reshard_policy(params)
            loss_ps, loss_pt, acc = self._loss_and_acc(params, batch, num_sentence)
            return loss_ps, (loss_pt, acc)

        import re

        from touchnet_tpu.parallel.sharding import _path_str

        frozen_res = [re.compile(r) for r in self.train_spec.frozen_params_re]

        def _is_frozen(path) -> bool:
            ps = _path_str(path)
            return any(r.fullmatch(ps) or r.match(ps) for r in frozen_res)

        value_and_grad = self._value_and_grad(loss_fn)
        fused_adamw = self._fused_adamw_enabled(frozen_res)

        def _apply_fused_adamw(grads, opt_state, params, scale, finite):
            """Clip scale, AdamW update, and the non-finite hold in one fused
            XLA pass per leaf — the optax chain runs the clip multiply and
            the two where(finite) holds as separate HBM round trips
            (ops/fused_adamw.py; reference multi-tensor fused AdamW,
            touchnet/utils/optimizer.py:151-164)."""
            from touchnet_tpu.ops.fused_adamw import fused_adamw_step

            adam = next(
                s for s in opt_state if isinstance(s, optax.ScaleByAdamState)
            )
            ob = self.opt_bundle
            new_params, mu, nu, cnt = fused_adamw_step(
                grads, params, adam.mu, adam.nu, adam.count,
                lr=self.schedule(adam.count),
                b1=ob.b1, b2=ob.b2, eps=ob.eps, weight_decay=ob.weight_decay,
                clip_scale=scale, finite=finite,
            )
            new_elems = []
            for s in opt_state:
                if isinstance(s, optax.ScaleByAdamState):
                    new_elems.append(
                        optax.ScaleByAdamState(count=cnt, mu=mu, nu=nu)
                    )
                elif "count" in getattr(s, "_fields", ()):
                    # e.g. ScaleByScheduleState — keep its step counter in
                    # lockstep with the adam count
                    new_elems.append(
                        s._replace(count=cnt.astype(s.count.dtype))
                    )
                else:
                    new_elems.append(s)
            return new_params, tuple(new_elems)

        accum = cfg.training_gradient_accumulation_steps

        def _grads_and_metrics(params, batch, num_sentence):
            """accum=1: one microbatch. accum=G: batch arrays carry a leading
            [G] axis; lax.scan sums grads across microbatches — exact,
            because every microbatch loss is already normalized by the GLOBAL
            num_sentence, so sum_g grad(sum_ce_g / N) = grad(sum_ce / N).
            Measured throughput-neutral on v5e (G=4 within 0.1% of G=1 at
            packed-8k); the win is activation memory: global batch G*B at
            the live-activation footprint of B."""
            if accum == 1:
                return value_and_grad(params, batch, num_sentence)

            def body(carry, mb):
                g_acc, lps, lpt, a = carry
                (l_ps, (l_pt, ac)), g = value_and_grad(params, mb, num_sentence)
                carry = (
                    jax.tree.map(jnp.add, g_acc, g),
                    lps + l_ps.astype(jnp.float32),
                    lpt + l_pt.astype(jnp.float32),
                    a + ac.astype(jnp.float32),
                )
                return carry, None

            init = (
                jax.tree.map(jnp.zeros_like, params),
                jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32),
            )
            (grads, loss_ps, loss_pt, acc), _ = jax.lax.scan(body, init, batch)
            # per-sample loss sums exactly; per-token loss and acc are
            # per-microbatch means (each is normalized within its microbatch)
            return (loss_ps, (loss_pt / accum, acc / accum)), grads

        def train_step(params, opt_state, batch, num_sentence, step):
            (loss_ps, (loss_pt, acc)), grads = _grads_and_metrics(
                params, batch, num_sentence
            )
            if frozen_res:
                # frozen submodules (e.g. the WhisperVQ tokenizer) get zero
                # grads so AdamW weight decay cannot drift them
                grads = jax.tree_util.tree_map_with_path(
                    lambda p, g: jnp.zeros_like(g) if _is_frozen(p) else g, grads
                )
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
            finite = jnp.isfinite(gnorm)
            if fused_adamw:
                new_params, new_opt = _apply_fused_adamw(
                    grads, opt_state, params, scale, finite
                )
            else:
                grads = jax.tree.map(lambda g: g * scale, grads)
                updates, new_opt = tx.update(grads, opt_state, params)
                if frozen_res:
                    updates = jax.tree_util.tree_map_with_path(
                        lambda p, u: jnp.zeros_like(u) if _is_frozen(p) else u,
                        updates,
                    )
                new_params = optax.apply_updates(params, updates)
                # skip the update entirely on non-finite grad norm
                # (reference train.py:467-471)
                new_params = jax.tree.map(
                    lambda n, o: jnp.where(finite, n, o), new_params, params
                )
                new_opt = jax.tree.map(
                    lambda n, o: jnp.where(finite, n, o), new_opt, opt_state
                )
            metrics = {
                "loss/per_sample": loss_ps,
                "loss/per_token": loss_pt,
                "acc": acc,
                "grad_norm": gnorm,
                "lr": self.schedule(step),
            }
            return new_params, new_opt, metrics

        return self._maybe_jit(train_step, donate_argnums=(0, 1))

    def _build_eval_step(self):
        def eval_step(params, batch, num_sentence):
            loss_ps, loss_pt, acc = self._loss_and_acc(params, batch, num_sentence)
            return {"loss_per_sample": loss_ps, "loss_per_token": loss_pt, "acc": acc}

        return self._maybe_jit(eval_step)

    # ------------------------------------------------------------------
    def _put_batch(self, batch: Dict[str, Any], *, stacked: Optional[bool] = None):
        """Host batch -> device arrays sharded (dp, cp). Multi-host: the
        batch holds only this process's dp shards; assemble the global array
        from process-local data.

        stacked: whether the batch carries a leading microbatch axis
        (train batches from _AccumBatcher when accumulation is on). Dev
        batches are NEVER stacked — they must use batch_specs and scale
        dim 0, whatever self._accum says."""
        stacked = (self._accum > 1) if stacked is None else stacked
        arrays = {
            k: batch[k]
            for k in _BATCH_ARRAY_KEYS
            if batch.get(k) is not None and isinstance(batch[k], np.ndarray)
        }
        # input NaN guard (reference modeling_touch_audio.py:133-134 raises
        # on NaN embeds in-graph; TPU-first, the check runs host-side on the
        # float features before they ever reach the device — data-dependent
        # raises cannot live under jit)
        for k, a in arrays.items():
            if np.issubdtype(a.dtype, np.floating) and not np.isfinite(a).all():
                raise ValueError(f"NaN/inf in data batch `{k}`.")
        if jax.process_count() > 1:
            # specs must be computed against GLOBAL shapes: this process's
            # arrays hold only its local dp-rank rows, and the spec shrinker
            # (sharding._shrink_spec_to_shape) would see a batch dim that the
            # dp axis doesn't divide and silently drop the dp sharding —
            # make_array_from_process_local_data would then mis-assemble the
            # local rows as a replicated GLOBAL batch (caught by the
            # 2-process trainer test, tests/.../test_multihost.py)
            scale = self.parallel_dims.dp_degree // max(
                1, len(self._local_dp_ranks or [])
            )
            batch_axis = 1 if stacked else 0
            gabstract = {
                k: jax.ShapeDtypeStruct(
                    a.shape[:batch_axis]
                    + (a.shape[batch_axis] * scale,)
                    + a.shape[batch_axis + 1:],
                    a.dtype,
                )
                if a.ndim > batch_axis else jax.ShapeDtypeStruct(a.shape, a.dtype)
                for k, a in arrays.items()
            }
            specs = (microbatch_specs if stacked else batch_specs)(
                gabstract, self.mesh
            )
            device_batch = jax.tree.map(
                lambda a, sh: jax.make_array_from_process_local_data(sh, a),
                arrays, specs,
            )
            # LOCAL sentence count; the caller folds it into the global sum
            # with _global_num_sentence. The allgather must NOT happen here:
            # _put_batch runs on the DevicePrefetcher fill thread, and a
            # cross-process collective issued from a background thread
            # interleaves unpredictably with the main thread's train-step
            # collectives — processes then disagree on collective order and
            # deadlock (flushed out by the 2-process trainer test; the
            # watchdog thread-dump showed one process in process_allgather
            # on its fill thread while its peer sat in device_get).
            num_sentence = float(batch.get("num_sentence", 0))
        else:
            specs = (microbatch_specs if stacked else batch_specs)(
                arrays, self.mesh
            )
            device_batch = jax.device_put(arrays, specs)
            num_sentence = jnp.asarray(batch.get("num_sentence", 0), jnp.float32)
        for k in _BATCH_ARRAY_KEYS:
            device_batch.setdefault(k, None)
        return device_batch, num_sentence

    @staticmethod
    def _global_num_sentence(num_sentence):
        """Sum the per-process sentence counts (reference dist_sum over
        mesh["dp"], train.py:340-343). MAIN THREAD ONLY: every process must
        issue its collectives in one order from one thread — this runs at
        batch consumption, strictly alternating with train-step dispatch.

        Cost note: this is a blocking host-side allgather (a cross-process
        barrier) per consumed batch. The barrier-free alternative — ride
        the local count through make_array_from_process_local_data as one
        more batch array and sum it inside the jitted step — is known and
        deliberately not taken: the count feeds the loss DIVISOR, so it
        would change the step signature for a sync that overlaps the
        host-side dispatch gap anyway (the device is still executing the
        previous step; single-process runs never reach this path)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(
                jnp.asarray(num_sentence, jnp.float32)
            ).sum()
        return jnp.asarray(num_sentence, jnp.float32)

    def train(self):
        cfg = self.job_config
        total_steps = cfg.lr_scheduler_steps
        logger.info(f"training starts at step {self.step + 1}/{total_steps}")
        # graceful preemption: TPU pods get SIGTERM ahead of eviction; save
        # at the next step boundary and exit cleanly (the reference leans on
        # torchrun elastic restarts; single-controller JAX owns this itself)
        self._preempted = False

        def _on_sigterm(signum, frame):
            self._preempted = True
            logger.warning(
                "SIGTERM received — will checkpoint at the next step "
                "boundary and exit"
            )

        import signal

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (e.g. threaded tests)
            prev_handler = None
        # step-timeout failure detector; step 1 (compile) gets the looser
        # init timeout, steady state the tight one (reference set_pg_timeouts)
        from touchnet_tpu.utils.distributed import StepWatchdog

        watchdog = StepWatchdog(
            cfg.training_train_timeout_seconds, cfg.training_trace_dump_folder,
            abort=cfg.training_abort_on_timeout,
        )
        # the INIT watchdog never aborts: step 1 includes the XLA compile,
        # and a deterministically slow compile would otherwise become an
        # abort->restart->same-compile crash loop under bin/elastic.py.
        # This matches the reference, which tightens PG timeouts only
        # AFTER the first step (set_pg_timeouts, distributed.py:399-423).
        init_watchdog = StepWatchdog(
            cfg.training_init_timeout_seconds, cfg.training_trace_dump_folder,
            abort=False,
        )
        try:
            self._train_loop(cfg, total_steps, watchdog, init_watchdog)
        finally:
            # restore even when the loop raises (watchdog abort, data
            # error): a leaked handler would pin this Trainer for the
            # process lifetime and double-checkpoint on a later SIGTERM
            watchdog.close()
            init_watchdog.close()
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        if cfg.training_ckpt_model_weights_only and self.checkpointer.enabled:
            self.checkpointer.wait_until_finished()
            export_weights_only(
                self.params,
                os.path.join(self.checkpointer.folder, "weights_only"),
                cfg.training_ckpt_export_dtype,
            )
        self.checkpointer.wait_until_finished()
        self.metrics_processor.close()
        logger.info("training completed")

    def _train_loop(self, cfg, total_steps, watchdog, init_watchdog):
        with maybe_enable_profiling(cfg, self.step) as profiler, \
                maybe_enable_memory_snapshot(cfg, self.step) as mem_profiler:
            def stage(batch):
                ntokens = int((batch["labels"] != -100).sum())
                device_batch, num_sentence = self._put_batch(batch)
                return device_batch, num_sentence, ntokens

            loader = self.dataloader
            if self._accum > 1:
                loader = _AccumBatcher(loader, self._accum)
            data_iter = DevicePrefetcher(
                loader, stage,
                depth=self.data_config.dataloader_device_prefetch,
            )
            # ntokens counts span all local dp streams; metrics normalizes
            # to per-stream (= per-chip after /non_dp) tokens
            self.metrics_processor.ntokens_streams = len(self.dataloader.loaders)
            # checkpoints must record the state of the last TRAINED batch,
            # not the last prefetched one
            self.checkpointer.dataloader = _PrefetchStateView(
                data_iter, self.dataloader
            )
            last_metrics = None
            while self.step < total_steps:
                self.gc_handler.run(self.step)
                (init_watchdog if self.step < 2 else watchdog).arm()
                t0 = time.perf_counter()
                try:
                    device_batch, num_sentence, ntokens = next(data_iter)
                    num_sentence = self._global_num_sentence(num_sentence)
                except StopIteration:
                    logger.info("dataloader exhausted; ending training")
                    break
                self.metrics_processor.data_loading_times.append(
                    time.perf_counter() - t0
                )
                self.metrics_processor.ntokens_since_last_log += ntokens

                self.step += 1
                self.checkpointer.maybe_wait_for_staging()
                self.params, self.opt_state, metrics = self.train_step_fn(
                    self.params, self.opt_state, device_batch, num_sentence,
                    self.step,
                )
                last_metrics = metrics

                if self.metrics_processor.should_log(self.step):
                    host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    self.metrics_processor.log(self.step, host)

                init_watchdog.disarm()
                watchdog.disarm()
                saved = self.checkpointer.save(
                    self.step,
                    self.params,
                    self.opt_state,
                    force=(self.step == total_steps),
                )
                if profiler is not None:
                    profiler.step(self.step)
                if mem_profiler is not None:
                    mem_profiler.step(self.step)
                if saved and self.has_dev:
                    self.dev()
                if self._preempted:
                    if not saved and self.checkpointer.enabled:
                        self.checkpointer.save(
                            self.step, self.params, self.opt_state, force=True
                        )
                    logger.warning(
                        f"exiting on preemption at step {self.step} "
                        f"(checkpoint {'saved' if self.checkpointer.enabled else 'DISABLED'})"
                    )
                    break

            if last_metrics is not None:
                host = {k: float(v) for k, v in jax.device_get(last_metrics).items()}
                self.metrics_processor.log(self.step, host)

    def dev(self):
        """Dev-set eval pass (reference Trainer.dev, train.py:588-621).

        Multi-host: same contract as training — each process builds only
        its own dp-rank streams (make_array_from_process_local_data needs
        every process to contribute exactly its local shard), and loop
        termination is agreed across processes each iteration."""
        dev_loader = GlobalBatchLoader(
            self.train_spec.build_dataloader_fn,
            self.data_config,
            self.tokenizer,
            self.parallel_dims.dp_degree,
            "dev",
            dp_ranks=self._local_dp_ranks,
        )
        totals = {"loss_per_sample": 0.0, "loss_per_token": 0.0, "acc": 0.0}
        n = 0
        it = iter(dev_loader)
        multi = jax.process_count() > 1
        while True:
            batch = next(it, None)
            if multi:
                # lockstep termination: a process whose dev streams run dry
                # early must NOT leave the others hanging in eval_step's
                # collectives — every process agrees on continuation first
                from jax.experimental import multihost_utils

                have = multihost_utils.process_allgather(
                    jnp.asarray(float(batch is not None), jnp.float32)
                ).min()
                if have < 1.0:
                    break
            elif batch is None:
                break
            device_batch, num_sentence = self._put_batch(batch, stacked=False)
            num_sentence = self._global_num_sentence(num_sentence)
            m = jax.device_get(
                self.eval_step_fn(self.params, device_batch, num_sentence)
            )
            # eval_step runs under SPMD over global arrays: each metric is
            # the same GLOBAL scalar on every process — no further reduce
            for k in totals:
                totals[k] += float(m[k])
            n += 1
        dev_loader.shutdown()
        if n:
            self.metrics_processor.log_dev(
                self.step, {k: v / n for k, v in totals.items()}
            )

    def close(self):
        self.checkpointer.close()
        self.dataloader.shutdown()


def _dtype(name: str):
    return {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "float16": jnp.float16,
    }[name]


ASYNC_TP_XLA_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true"
    " --xla_tpu_enable_async_collective_fusion_fuse_all_gather=true"
    " --xla_tpu_overlap_compute_collective_tc=true"
    " --xla_enable_async_all_gather=true"
)


def _maybe_enable_async_tp(job_config):
    """Async tensor parallel (reference enable_symm_mem + _micro_pipeline_tp,
    SURVEY.md §2.5): on TPU this is XLA's latency-hiding scheduler +
    collective-matmul fusion. Flags must land before backend init —
    ensure_xla_flags raises if the backend already initialized (then the
    launcher must export them; the recipes do)."""
    if not job_config.training_enable_async_tensor_parallel:
        return
    from touchnet_tpu.utils.distributed import ensure_xla_flags

    ensure_xla_flags(ASYNC_TP_XLA_FLAGS, "async TP")


def main(argv: Optional[list] = None):
    tokenizer_config, data_config, job_config = parse_args_into_dataclasses(
        [TokenizerConfig, DataConfig, TrainConfig], argv
    )
    _maybe_enable_async_tp(job_config)
    trainer = Trainer(tokenizer_config, data_config, job_config)
    try:
        trainer.train()
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
