# Copyright (c) 2026 touchnet_tpu authors.
# Qwen2-Audio data pipeline: whisper features + <|AUDIO|> token expansion +
# prompt-masked labels + token-budget dynamic batching.
#
# Capability parity: reference touchnet/models/qwen2_audio/
# processing_qwen2_audio.py:17-209 —
#   - template "<|audio_bos|><|AUDIO|><|audio_eos|>{instruct}";
#   - whisper features padded to 30s, truncation disabled for long audio
#     (with the reference's all-ones-mask workaround for >30s);
#   - audio token count = ((mask_len - 1) // 2 + 1 - 2) // 2 + 1;
#   - labels: prompt masked with -100, response + eos supervised; labels are
#     pre-shifted by one (the "shift_labels" convention);
#   - token-budget dynamic batching with right padding.
# Feature extraction runs through our numpy whisper log-mel (data/dsp.py)
# when no HF processor is given, so the pipeline works offline; with
# data_config.processor_model set, the HF AutoProcessor is used verbatim.



import numpy as np

from touchnet_tpu.data import DataConfig, dsp
from touchnet_tpu.data.datapipe import LowLevelTouchDatapipe, MidLevelTouchDatapipe
from touchnet_tpu.utils.logging import logger

QWEN2_AUDIO_TEMPLATE_FOR_S2T = "<|audio_bos|><|AUDIO|><|audio_eos|><|INSTRUCT|>"
IGNORE_ID = -100
_WHISPER_SR = 16000
_WHISPER_MAX_FRAMES = 3000  # 30 s @ 10 ms hop


def whisper_features(
    waveform: np.ndarray, sample_rate: int, n_mels: int = 128
) -> (np.ndarray, np.ndarray):
    """WhisperFeatureExtractor semantics (numpy): pad to >=30 s, log-mel,
    return features [T_frames, n_mels] + frame attention mask."""
    wav = np.asarray(waveform, dtype=np.float32).reshape(-1)
    if sample_rate != _WHISPER_SR:
        wav = dsp.resample(wav, sample_rate, _WHISPER_SR)
    n_samples = wav.shape[0]
    n_frames = n_samples // 160
    pad_to = max(_WHISPER_MAX_FRAMES * 160, n_frames * 160)
    if n_samples < pad_to:
        wav = np.concatenate([wav, np.zeros(pad_to - n_samples, np.float32)])
    feats = dsp.log_mel_spectrogram(wav, _WHISPER_SR, n_fft=400, hop_length=160,
                                    n_mels=n_mels)
    mask = np.zeros(feats.shape[0], np.int32)
    # reference >30s workaround: all-ones mask for long audio
    if feats.shape[0] > _WHISPER_MAX_FRAMES:
        mask[:] = 1
    else:
        mask[: max(n_frames, 1)] = 1
    return feats, mask


class ManualQwen2AudioFrontend:
    """Offline stand-in for Qwen2AudioProcessor: tokenizer + numpy whisper
    features. `tokenizer` must resolve the audio special tokens."""

    def __init__(self, tokenizer, n_mels: int = 128, audio_token: str = "<|AUDIO|>",
                 audio_bos: str = "<|audio_bos|>", audio_eos: str = "<|audio_eos|>"):
        self.tokenizer = tokenizer
        self.n_mels = n_mels
        self.audio_token = audio_token
        self.audio_bos = audio_bos
        self.audio_eos = audio_eos

    def extract(self, waveform, sample_rate):
        return whisper_features(waveform, sample_rate, self.n_mels)

    def tokenize(self, text: str):
        return self.tokenizer.tokenize(text, add_special_tokens=False)

    @property
    def pad_id(self):
        return self.tokenizer.pad if self.tokenizer.pad is not None else 0

    @property
    def eos_id(self):
        return self.tokenizer.eos


class HFQwen2AudioFrontend:
    """Wraps transformers Qwen2AudioProcessor (reference behavior verbatim)."""

    def __init__(self, processor):
        self.processor = processor
        self.audio_token = "<|AUDIO|>"
        self.audio_bos = "<|audio_bos|>"
        self.audio_eos = "<|audio_eos|>"

    def extract(self, waveform, sample_rate):
        fe = self.processor.feature_extractor
        out = fe(
            np.asarray(waveform).reshape(-1),
            sampling_rate=fe.sampling_rate,
            truncation=False,
            return_attention_mask=True,
            padding="max_length",
            return_tensors="np",
        )
        feats = out["input_features"][0].T  # [T, mel]
        mask = out["attention_mask"][0]
        if feats.shape[0] > _WHISPER_MAX_FRAMES:
            mask = np.ones(feats.shape[0], mask.dtype)
        return feats, mask

    def tokenize(self, text: str):
        return self.processor.tokenizer(text, add_special_tokens=False).input_ids

    @property
    def pad_id(self):
        return self.processor.tokenizer.pad_token_id

    @property
    def eos_id(self):
        return self.processor.tokenizer.eos_token_id


def count_audio_spans(ids: np.ndarray, audio_id: int) -> int:
    """Number of contiguous runs of the audio placeholder token in a row."""
    m = np.asarray(ids) == audio_id
    starts = m & ~np.concatenate([[False], m[:-1]])
    return int(starts.sum())


def dynamic_batch(data, config: DataConfig, frontend):
    """Token-budget dynamic batching of (audio, instruct, response) samples."""
    ids_buf, mask_buf, labels_buf, slens_buf = [], [], [], []
    feats_buf, feat_mask_buf = [], []
    longest = 0
    budget = config.dataset_batchsize * config.dataset_text_seqlen
    audio_ids = frontend.tokenize(frontend.audio_token)
    audio_id = audio_ids[0] if len(audio_ids) == 1 else None

    def emit():
        pad = frontend.pad_id
        return {
            "input_ids": _pad_stack(ids_buf, pad),
            "attention_mask": _pad_stack(mask_buf, 0),
            "labels": _pad_stack(labels_buf, IGNORE_ID),
            "shift_labels": _pad_stack(labels_buf, IGNORE_ID),
            "input_features": _pad_stack(feats_buf, 0.0).transpose(0, 2, 1),  # [B,mel,T]
            "feature_attention_mask": _pad_stack(feat_mask_buf, 0),
            "num_sentence": len(ids_buf),
            "sentence_lens": _pad_stack(slens_buf, 1),
        }

    for sample in data:
        assert "waveform" in sample
        if "instruct" not in sample:
            sample["instruct"] = "Generate the transcription:"
        if "response" not in sample:
            if "txt" in sample:
                sample["response"] = sample["txt"]
            else:
                logger.info(f"txt not in sample, skip this sample {sample}")
                continue

        feats, feat_mask = frontend.extract(sample["waveform"], sample["sample_rate"])
        audio_length = int(feat_mask.sum())
        if audio_length * 10 > config.audio_max_length_in_ms_for_filter:
            continue
        input_length = (audio_length - 1) // 2 + 1
        num_audio_tokens = (input_length - 2) // 2 + 1
        text = QWEN2_AUDIO_TEMPLATE_FOR_S2T.replace("<|INSTRUCT|>", sample["instruct"])
        expanded = text.replace(
            frontend.audio_token, frontend.audio_token * int(num_audio_tokens), 1
        )
        prompt_ids = np.asarray(frontend.tokenize(expanded), np.int32)
        response_ids = np.asarray(frontend.tokenize(sample["response"]), np.int32)
        eos = np.asarray([frontend.eos_id], np.int32)

        input_ids = np.concatenate([prompt_ids, response_ids])
        # the model's <|AUDIO|> merge is a per-row cumsum gather that assumes
        # exactly ONE contiguous audio span per sample (the reference's
        # masked_scatter handles any number; modeling_qwen2_audio.py:10-14) —
        # a second span (e.g. "<|AUDIO|>" inside the instruct text) would
        # silently consume the same audio's frames, so reject it loudly here
        if audio_id is not None:
            n_spans = count_audio_spans(input_ids, audio_id)
            if n_spans == 0:
                # degenerate clip (<= ~30 ms expands to zero placeholder
                # tokens) — a data problem, skipped like the length filters
                logger.info(
                    f"sample {sample.get('key', '<unknown>')!r} expands to "
                    f"0 <|AUDIO|> tokens ({audio_length} mel frames), skip"
                )
                continue
            if n_spans > 1:
                raise ValueError(
                    f"sample {sample.get('key', '<unknown>')!r} expands to "
                    f"{n_spans} <|AUDIO|> spans; the TPU merge (static "
                    "cumsum gather) supports exactly one audio span per "
                    f"sample — remove extra {frontend.audio_token!r} "
                    "occurrences from the instruct/response text"
                )
        labels = np.concatenate(
            [np.full(len(prompt_ids) - 1, IGNORE_ID, np.int32), response_ids, eos]
        )
        slens = np.full_like(labels, len(response_ids) + 1)

        n = input_ids.shape[0]
        if n < config.text_min_length_in_tokens_for_filter:
            continue
        if n > config.text_max_length_in_tokens_for_filter:
            continue

        longest = max(longest, n)
        if longest * (len(ids_buf) + 1) > budget and ids_buf:
            yield emit()
            ids_buf, mask_buf, labels_buf, slens_buf = [], [], [], []
            feats_buf, feat_mask_buf = [], []
            longest = n
        ids_buf.append(input_ids)
        mask_buf.append(np.ones_like(labels))
        labels_buf.append(labels)
        slens_buf.append(slens)
        feats_buf.append(feats)
        feat_mask_buf.append(feat_mask)

    if (not config.dataloader_drop_last_batch) and ids_buf:
        yield emit()


def _pad_stack(arrs, pad_value, dtype=None):
    maxlen = max(a.shape[0] for a in arrs)
    out = np.full((len(arrs), maxlen) + arrs[0].shape[1:], pad_value,
                  dtype or arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
    return out


def qwen2_audio_datapipe(
    data_config: DataConfig,
    tokenizer,
    dp_rank: int,
    dp_world_size: int,
    worker_id: int = 0,
    num_workers: int = 1,
    split: str = "train",
):
    """LowLevel -> dynamic_batch. With processor_model set, the HF processor
    is used (reference path); otherwise the offline numpy frontend wraps the
    provided tokenizer."""
    if data_config.processor_model:
        import transformers

        processor = transformers.AutoProcessor.from_pretrained(
            data_config.processor_model, trust_remote_code=True
        )
        frontend = HFQwen2AudioFrontend(processor)
    else:
        frontend = ManualQwen2AudioFrontend(
            tokenizer, n_mels=data_config.audiofeat_num_mel_bins
        )
    datapipe = LowLevelTouchDatapipe(
        data_config, dp_rank, dp_world_size, worker_id, num_workers, split
    )
    return MidLevelTouchDatapipe(datapipe, dynamic_batch, data_config, frontend)
