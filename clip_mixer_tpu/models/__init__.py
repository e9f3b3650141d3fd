"""Model cores: pure-pytree functional CLIP with mixer/transformer/resnet towers."""

from clip_mixer_tpu.models import clip

__all__ = ["clip"]
