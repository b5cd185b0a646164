"""Token-level constants shared across the framework.

Parity reference: /root/reference/videochat_flash/constants.py:1-12 and
conversation.py:10-13 define the same values for the PyTorch implementation.
"""

# Label value ignored by the cross-entropy criteria.
IGNORE_INDEX = -100

# Placeholder id spliced into tokenized prompts where video/image embeddings go.
IMAGE_TOKEN_INDEX = -200

# The literal placeholder string used in prompt templates.
DEFAULT_IMAGE_TOKEN = "<image>"

# Qwen2 `<|im_end|>` token id. The reference uses it both as the ChatML turn
# terminator and as the anchor for locating the visual-token block in TVG
# label arrays (reference: conversation.py:13, training_utils.py:72).
IMAGE_TOKEN_ID = 151645

# Qwen2 `<|im_start|>` token id.
IM_START_TOKEN_ID = 151644

# Qwen2 `<|endoftext|>` token id, used as pad (reference:
# modeling_videochat_flash.py:690-692 sets pad_token_id = 151643 for qwen).
QWEN2_PAD_TOKEN_ID = 151643

DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
