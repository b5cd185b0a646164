from blim_tpu.models import generation, projector, qwen2, umt_vit, videochat_flash  # noqa: F401
