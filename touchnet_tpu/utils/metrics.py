# Copyright (c) 2026 touchnet_tpu authors.
# Telemetry: throughput, MFU, device memory, logger backends.
#
# Capability parity: reference touchnet/utils/metrics.py:26-539
# (MetricsProcessor with tps/MFU/tflops/data-loading%/memory/loss/acc/lr,
# colored stdout + TensorBoard/wandb, GPU peak-flops table + lspci sniffing).
# The peak-flops table is TPU generations (bf16 dense), detected from
# jax.devices()[0].device_kind; memory polling uses device.memory_stats().

import os
import time
from collections import namedtuple
from datetime import datetime
from typing import Any, Dict, Optional

import jax

from touchnet_tpu.utils.logging import Color, NoColor, logger

# bf16 dense peak FLOPS per chip (MXU); sparse/int8 modes excluded.
# Sources: public TPU spec sheets (v4 275T, v5e 197T, v5p 459T, v6e 918T).
TPU_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
    "TPU7x": 2307e12,
}
_DEFAULT_PEAK = 197e12


def get_peak_flops(device_kind: Optional[str] = None) -> float:
    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    for key, flops in sorted(TPU_PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if device_kind.startswith(key):
            return flops
    logger.warning(f"unknown device kind {device_kind!r}; assuming v5e peak flops")
    return _DEFAULT_PEAK


DeviceMemStats = namedtuple(
    "DeviceMemStats",
    ["max_active_gib", "max_active_pct", "max_reserved_gib", "max_reserved_pct"],
)

_GIB = 1024**3


class DeviceMemoryMonitor:
    """HBM usage via device.memory_stats() (replaces torch.cuda alloc stats,
    reference metrics.py:117-179)."""

    def __init__(self, device=None):
        self.device = device if device is not None else jax.local_devices()[0]
        stats = self.device.memory_stats() or {}
        self.total = stats.get("bytes_limit", 0) or 1
        self.device_name = self.device.device_kind
        self.device_capacity_gib = self.total / _GIB
        self._peak = 0

    def get_peak_stats(self) -> DeviceMemStats:
        stats = self.device.memory_stats() or {}
        in_use = stats.get("bytes_in_use", 0)
        peak = stats.get("peak_bytes_in_use", in_use)
        self._peak = max(self._peak, peak)
        return DeviceMemStats(
            max_active_gib=in_use / _GIB,
            max_active_pct=100 * in_use / self.total,
            max_reserved_gib=self._peak / _GIB,
            max_reserved_pct=100 * self._peak / self.total,
        )

    def reset_peak_stats(self):
        self._peak = 0


def build_device_memory_monitor():
    try:
        return DeviceMemoryMonitor()
    except Exception as e:  # CPU backends have no memory_stats
        logger.debug(f"no device memory monitor: {e}")
        return None


class BaseLogger:
    def log(self, metrics: Dict[str, Any], step: int) -> None:
        pass

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        pass

    def close(self) -> None:
        pass


class TensorBoardLogger(BaseLogger):
    def __init__(self, log_dir: str, tag: Optional[str] = None):
        self.tag = tag
        from torch.utils.tensorboard import SummaryWriter  # torch cpu build

        self.writer = SummaryWriter(log_dir, max_queue=1000)
        logger.info(f"TensorBoard logging to {log_dir}")

    def log(self, metrics, step):
        for k, v in metrics.items():
            tag = k if self.tag is None else f"{self.tag}/{k}"
            try:
                self.writer.add_scalar(tag, v, step)
            except Exception:
                pass

    def log_hparams(self, hparams):
        try:
            self.writer.add_hparams(
                {k: v for k, v in hparams.items()
                 if isinstance(v, (int, float, str, bool))},
                {},
                run_name=".",
            )
        except Exception as e:
            logger.debug(f"hparams logging failed: {e}")

    def close(self):
        self.writer.close()


class WandBLogger(BaseLogger):
    def __init__(self, log_dir: str, tag: Optional[str] = None):
        import wandb

        self.wandb = wandb
        self.tag = tag
        self.wandb.init(project=os.getenv("WANDB_PROJECT", "touchnet_tpu"),
                        dir=log_dir)

    def log(self, metrics, step):
        m = {k if self.tag is None else f"{self.tag}/{k}": v
             for k, v in metrics.items()}
        self.wandb.log(m, step=step)

    def log_hparams(self, hparams):
        self.wandb.config.update(hparams, allow_val_change=True)

    def close(self):
        if self.wandb.run is not None:
            self.wandb.finish()


def _build_logger(job_config, dump_dir: str) -> BaseLogger:
    if getattr(job_config, "training_enable_wandb", False):
        try:
            return WandBLogger(dump_dir)
        except Exception as e:
            logger.warning(f"wandb unavailable ({e}); falling back")
    if getattr(job_config, "training_enable_tensorboard", False):
        if (
            getattr(job_config, "training_tb_rank_0_only", True)
            and jax.process_index() != 0
        ):
            return BaseLogger()  # reference: TB writer on metrics rank only
        try:
            folder = os.path.join(
                dump_dir, job_config.training_save_tb_folder,
                datetime.now().strftime("%Y%m%d-%H%M"),
            )
            return TensorBoardLogger(folder)
        except Exception as e:
            logger.warning(f"tensorboard unavailable ({e}); falling back")
    return BaseLogger()


class MetricsProcessor:
    """Accumulates per-interval counters and emits the reference's log line:
    loss/acc/grad-norm/lr/memory/tps/tflops/MFU/data-loading time."""

    def __init__(self, job_config, parallel_dims, tag: Optional[str] = None):
        self.job_config = job_config
        self.parallel_dims = parallel_dims
        self.logger_backend = _build_logger(
            job_config, job_config.training_trace_dump_folder
        )
        self.device_memory_monitor = build_device_memory_monitor()
        self.peak_flops = get_peak_flops()
        self.color = Color() if _supports_color() else NoColor()

        self.ntokens_since_last_log = 0
        # number of dp loader streams contributing to ntokens counts: the
        # trainer accumulates the tokens of ALL its local dp streams, while
        # the reference counts one rank's local tokens (metrics.py:381-539)
        # — divide by the stream count so tps/MFU stay per-chip under dp>1
        self.ntokens_streams = 1
        self.data_loading_times = []
        self.time_last_log = time.perf_counter()
        self.num_flop_per_token = 0  # set by trainer
        self.optimizers = None
        self.lr_schedulers = None

    def should_log(self, step: int) -> bool:
        return step == 1 or step % self.job_config.training_log_freq == 0

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        time_delta = time.perf_counter() - self.time_last_log
        nd = self.parallel_dims
        # tokens/sec per chip: per-dp-stream tokens (global count divided by
        # contributing streams) over the non-dp chips that cooperate on one
        # stream (reference divides local-rank tokens by non-dp size)
        tps = (
            self.ntokens_since_last_log
            / max(self.ntokens_streams, 1)
            / time_delta
            / max(nd.non_data_parallel_size, 1)
        )
        tflops = self.num_flop_per_token * tps / 1e12
        mfu = 100 * self.num_flop_per_token * tps / self.peak_flops

        time_data_loading = sum(self.data_loading_times)
        pct_data = 100 * time_data_loading / time_delta if time_delta else 0.0

        out = dict(metrics)
        out.update(
            {
                "throughput/tps": tps,
                "throughput/tflops": tflops,
                "throughput/mfu_pct": mfu,
                "time/data_loading_s": time_data_loading,
                "time/data_loading_pct": pct_data,
            }
        )
        mem = (
            self.device_memory_monitor.get_peak_stats()
            if self.device_memory_monitor
            else None
        )
        if mem:
            out.update(
                {
                    "memory/max_active_gib": mem.max_active_gib,
                    "memory/max_active_pct": mem.max_active_pct,
                    "memory/peak_gib": mem.max_reserved_gib,
                    "memory/peak_pct": mem.max_reserved_pct,
                }
            )
        self.logger_backend.log(out, step)

        c = self.color
        pieces = [f"{c.cyan}step {step:6d}"]
        if "loss/per_sample" in metrics:
            pieces.append(f"{c.green}loss {metrics['loss/per_sample']:.4f}"
                          f"/{metrics.get('loss/per_token', 0):.4f}")
        if "acc" in metrics:
            pieces.append(f"{c.blue}acc {metrics['acc']:.4f}")
        if "grad_norm" in metrics:
            pieces.append(f"{c.magenta}gnorm {metrics['grad_norm']:.3f}")
        if "lr" in metrics:
            pieces.append(f"{c.yellow}lr {metrics['lr']:.2e}")
        if mem:
            pieces.append(
                f"{c.white}mem {mem.max_reserved_gib:.1f}GiB"
                f"({mem.max_reserved_pct:.0f}%)"
            )
        pieces.append(f"{c.red}tps {tps:,.0f}")
        pieces.append(f"{c.cyan}tflops {tflops:.1f}")
        pieces.append(f"{c.magenta}mfu {mfu:.2f}%")
        pieces.append(f"{c.white}data {pct_data:.1f}%{c.reset}")
        logger.info("  ".join(pieces))

        self.ntokens_since_last_log = 0
        self.data_loading_times.clear()
        self.time_last_log = time.perf_counter()

    def log_dev(self, step: int, metrics: Dict[str, float]) -> None:
        self.logger_backend.log(
            {f"dev/{k}": v for k, v in metrics.items()}, step
        )
        c = self.color
        parts = "  ".join(f"{k} {v:.4f}" for k, v in metrics.items())
        logger.info(f"{c.green}[dev] step {step:6d}  {parts}{c.reset}")

    def close(self):
        self.logger_backend.close()


def _supports_color() -> bool:
    return os.environ.get("NO_COLOR") is None and os.isatty(1)


def build_metrics_processor(job_config, parallel_dims, tag=None):
    return MetricsProcessor(job_config, parallel_dims, tag)
