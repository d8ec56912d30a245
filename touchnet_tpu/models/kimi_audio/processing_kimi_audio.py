# Copyright (c) 2026 touchnet_tpu authors.
# Kimi-Audio data pipeline: dual-stream (text + audio) prompts with
# blank-token alignment + whisper features + dynamic batching.
#
# Capability parity: reference touchnet/models/kimi_audio/
# processing_kimi_audio.py:38-224 —
#   - parallel text/audio prompt streams built from the S2T chat templates,
#     padded against each other with <|im_kimia_text_blank|>;
#   - num audio tokens = feature mask [::2][::4] sum (conv + pool subsample);
#   - labels supervise the text response + <|im_kimia_text_eos|>;
#   - WhisperFeatureExtractor 30s-padded features;
#   - token-budget dynamic batching, right padding.
# Offline mode uses the numpy whisper features (data/dsp.py) and a tokenizer
# that resolves the kimi special tokens; with processor_model set, the HF
# WhisperFeatureExtractor is used verbatim.

import numpy as np

from touchnet_tpu.data import DataConfig
from touchnet_tpu.data.datapipe import LowLevelTouchDatapipe, MidLevelTouchDatapipe
from touchnet_tpu.models.qwen2_audio.processing_qwen2_audio import (
    _pad_stack,
    whisper_features,
)

IGNORE_ID = -100

KIMI_TEXT_TEMPLATE_FOR_S2T = (
    "<|im_kimia_user_msg_start|><|INSTRUCT|><|im_kimia_text_blank|><|AUDIO|>"
    "<|im_kimia_text_blank|><|im_kimia_text_blank|><|im_kimia_text_blank|>"
    "<|im_kimia_text_blank|>"
)
KIMI_AUDIO_TEMPLATE_FOR_S2T = (
    "<|im_kimia_text_blank|><|INSTRUCT|><|im_media_begin|><|AUDIO|>"
    "<|im_media_end|><|im_kimia_speech_ct_id|><|im_msg_end|>"
    "<|im_kimia_assistant_msg_start|>"
)


def dynamic_batch(data, config: DataConfig, extract_fn, tokenizer):
    """extract_fn(waveform, sample_rate) -> (features [T,mel], frame_mask)."""
    text_ids_buf, mask_buf, labels_buf, slens_buf = [], [], [], []
    audio_ids_buf = []
    feats_buf, feat_mask_buf = [], []
    longest = 0
    budget = config.dataset_batchsize * config.dataset_text_seqlen
    blank = "<|im_kimia_text_blank|>"

    def tok(text):
        return tokenizer.tokenize(text, add_special_tokens=False)

    media_begin = tok("<|im_media_begin|>")
    media_end = tok("<|im_media_end|>")
    # the model locates the media span by single marker ids
    # (config.kimia_media_begin/end, modeling_kimi_audio.py:301-308); a
    # tokenizer that splits either marker into several ids would emit a
    # stream the model silently cannot find the span in — reject at setup
    if len(media_begin) != 1 or len(media_end) != 1:
        raise ValueError(
            "<|im_media_begin|>/<|im_media_end|> must each tokenize to one "
            f"id (got {len(media_begin)}/{len(media_end)}); this tokenizer "
            "cannot drive the Kimi-Audio speech merge"
        )

    def emit():
        pad = tokenizer.pad if tokenizer.pad is not None else 0
        return {
            "text_input_ids": _pad_stack(text_ids_buf, pad),
            "audio_input_ids": _pad_stack(audio_ids_buf, pad),
            "attention_mask": _pad_stack(mask_buf, 0),
            "labels": _pad_stack(labels_buf, IGNORE_ID),
            "shift_labels": _pad_stack(labels_buf, IGNORE_ID),
            "whisper_input_features": _pad_stack(feats_buf, 0.0).transpose(0, 2, 1),
            "whisper_attention_mask": _pad_stack(feat_mask_buf, 0),
            "num_sentence": len(text_ids_buf),
            "sentence_lens": _pad_stack(slens_buf, 1),
        }

    for sample in data:
        assert "waveform" in sample
        if "instruct" not in sample:
            sample["instruct"] = "Generate the transcription:"
        if "response" not in sample:
            assert "txt" in sample
            sample["response"] = sample["txt"]

        feats, feat_mask = extract_fn(sample["waveform"], sample["sample_rate"])
        num_audio_tokens = int(feat_mask[::2][::4].sum())  # conv/2 then pool/4

        instruct_ids = tok(sample["instruct"])
        response_ids = tok(sample["response"])
        text_prompt = KIMI_TEXT_TEMPLATE_FOR_S2T.replace(
            "<|INSTRUCT|>", sample["instruct"]
        ).replace("<|AUDIO|>", blank * num_audio_tokens)
        audio_prompt = KIMI_AUDIO_TEMPLATE_FOR_S2T.replace(
            "<|INSTRUCT|>", blank * len(instruct_ids)
        ).replace("<|AUDIO|>", blank * num_audio_tokens)
        text_prompt_ids = np.asarray(tok(text_prompt), np.int32)
        audio_prompt_ids = np.asarray(tok(audio_prompt), np.int32)
        text_response_ids = np.asarray(response_ids, np.int32)
        audio_response_ids = np.asarray(tok(blank * len(response_ids)), np.int32)
        eos = np.asarray(tok("<|im_kimia_text_eos|>"), np.int32)

        assert len(text_prompt_ids) == len(audio_prompt_ids), (
            len(text_prompt_ids), len(audio_prompt_ids)
        )
        assert len(text_response_ids) == len(audio_response_ids)

        text_input_ids = np.concatenate([text_prompt_ids, text_response_ids])
        audio_input_ids = np.concatenate([audio_prompt_ids, audio_response_ids])
        # the model scatters speech embeddings between <|im_media_begin|> /
        # <|im_media_end|> with a per-row cumsum gather that assumes exactly
        # ONE media span per sample (modeling_kimi_audio.py:301-308); extra
        # markers (e.g. injected via the instruct text) would silently
        # mis-fuse, so reject them loudly
        n_begin = int((audio_input_ids == media_begin[0]).sum())
        n_end = int((audio_input_ids == media_end[0]).sum())
        if n_begin != 1 or n_end != 1:
            raise ValueError(
                f"sample {sample.get('key', '<unknown>')!r} expands to "
                f"{n_begin} <|im_media_begin|> / {n_end} <|im_media_end|> "
                "markers; the TPU speech merge (static cumsum gather) "
                "supports exactly one media span per sample — remove "
                "extra markers from the instruct/response text"
            )
        labels = np.concatenate(
            [np.full(len(text_prompt_ids) - 1, IGNORE_ID, np.int32),
             text_response_ids, eos]
        )
        slens = np.full_like(labels, len(text_response_ids) + 1)

        n = text_input_ids.shape[0]
        if n < config.text_min_length_in_tokens_for_filter:
            continue
        if n > config.text_max_length_in_tokens_for_filter:
            continue

        longest = max(longest, n)
        if longest * (len(text_ids_buf) + 1) > budget and text_ids_buf:
            yield emit()
            text_ids_buf, mask_buf, labels_buf, slens_buf = [], [], [], []
            audio_ids_buf, feats_buf, feat_mask_buf = [], [], []
            longest = n
        text_ids_buf.append(text_input_ids)
        audio_ids_buf.append(audio_input_ids)
        mask_buf.append(np.ones_like(labels))
        labels_buf.append(labels)
        slens_buf.append(slens)
        feats_buf.append(feats)
        feat_mask_buf.append(feat_mask)

    if (not config.dataloader_drop_last_batch) and text_ids_buf:
        yield emit()


def kimi_audio_datapipe(
    data_config: DataConfig,
    tokenizer,
    dp_rank: int,
    dp_world_size: int,
    worker_id: int = 0,
    num_workers: int = 1,
    split: str = "train",
):
    if data_config.processor_model:
        from transformers import WhisperFeatureExtractor

        fe = WhisperFeatureExtractor.from_pretrained(data_config.processor_model)

        def extract_fn(waveform, sample_rate):
            out = fe(
                np.asarray(waveform).reshape(-1),
                sampling_rate=fe.sampling_rate,
                return_attention_mask=True,
                return_tensors="np",
                padding="max_length",
            )
            return out["input_features"][0].T, out["attention_mask"][0]
    else:
        n_mels = data_config.audiofeat_num_mel_bins

        def extract_fn(waveform, sample_rate):
            return whisper_features(waveform, sample_rate, n_mels)

    datapipe = LowLevelTouchDatapipe(
        data_config, dp_rank, dp_world_size, worker_id, num_workers, split
    )
    return MidLevelTouchDatapipe(
        datapipe, dynamic_batch, data_config, extract_fn, tokenizer
    )
