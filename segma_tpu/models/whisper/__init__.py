from segma_tpu.models.whisper.builders import build_whisper_model

__all__ = ["build_whisper_model"]
