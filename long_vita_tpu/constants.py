"""Special-token vocabulary and image-normalization constants.

Behavioral parity with the reference's token vocabulary
(/root/reference/long_vita/constants.py:8-23,87-97): the same literal strings
must round-trip through the tokenizer so that released Long-VITA-*_HF
checkpoints produce identical token streams.
"""

# Placeholder tags that users put in prompts; expanded by the multimodal
# front-end into start/context/end runs.
IMG_TAG_TOKEN = "<image>"
VID_TAG_TOKEN = "<video>"
AUD_TAG_TOKEN = "<audio>"

IMG_CONTEXT_TOKEN = "<IMG_CONTEXT>"
IMG_START_TOKEN = "<img>"
IMG_END_TOKEN = "</img>"

VID_CONTEXT_TOKEN = "<VID_CONTEXT>"
VID_START_TOKEN = "<vid>"
VID_END_TOKEN = "</vid>"

PATCH_CONTEXT_TOKEN = "<PATCH_CONTEXT>"
PATCH_START_TOKEN = "<patch>"
PATCH_END_TOKEN = "</patch>"

AUD_START_TOKEN = "<|begin_of_audio|>"
AUD_END_TOKEN = "<|end_of_audio|>"

QUAD_START_TOKEN = "<quad>"
QUAD_END_TOKEN = "</quad>"
REF_START_TOKEN = "<ref>"
REF_END_TOKEN = "</ref>"
BOX_START_TOKEN = "<box>"
BOX_END_TOKEN = "</box>"

# Image normalization statistics (reference constants.py:87-92).
IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_STANDARD_MEAN = (0.5, 0.5, 0.5)
IMAGENET_STANDARD_STD = (0.5, 0.5, 0.5)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

# Loss masking sentinel (reference constants.py:97).
IGNORE_INDEX = -100

# Number of LM tokens one 448x448 tile expands to after pixel-shuffle 1/4
# downsampling of the 32x32 ViT patch grid (reference resampler_projector.py:13-14).
IMAGE_TOKEN_LENGTH = 256
