"""Hub entrypoints — the reference hubconf.py equivalent.

The reference dynamically creates one torch.hub entrypoint per registry model
with punctuation sanitised to underscores (hubconf.py:8,40-42). Same naming
here; each entrypoint returns ``(params, cfg, preprocess)`` from
``clip_mixer_tpu.load``.
"""

from clip_mixer_tpu.api import _MODELS, available_models, load
from clip_mixer_tpu.config import PRESETS

dependencies = ["jax", "numpy"]


def tokenize(*args, **kwargs):
    from clip_mixer_tpu.text import tokenize as _tokenize

    return _tokenize(*args, **kwargs)


def _create_entrypoint(model_name):
    def entrypoint(**kwargs):
        return load(model_name, **kwargs)

    entrypoint.__doc__ = f"Load the {model_name} model (params, cfg, preprocess)."
    return entrypoint


_SANITIZED = {
    name.replace("/", "_").replace("-", "_").replace("@", "_"): name
    for name in list(_MODELS.keys()) + list(PRESETS.keys())
}

for _entry, _name in _SANITIZED.items():
    globals()[_entry] = _create_entrypoint(_name)
