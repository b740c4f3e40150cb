"""Model registry — one framework instead of ten copied harnesses.

The reference swaps a single ``model_1 = ...`` constructor line across its 10
sibling subprojects (SURVEY.md §0). Here each model family registers a factory
under a name, and the trainer/CLI builds models via ``build(name, **kwargs)``.
"""

from __future__ import annotations

_REGISTRY: dict = {}


def register(name: str, **defaults):
    """Decorator: register a model factory under `name` with default kwargs."""

    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"model '{name}' already registered")
        _REGISTRY[name] = (fn, dict(defaults))
        return fn

    return deco


def build(name: str, **kwargs):
    """Instantiate a registered model; kwargs override registered defaults."""
    if name not in _REGISTRY:
        # import model modules lazily so registration side effects run
        from micformer_tpu import models  # noqa: F401

    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    fn, defaults = _REGISTRY[name]
    merged = {**defaults, **kwargs}
    return fn(**merged)


def available():
    from micformer_tpu import models  # noqa: F401

    return sorted(_REGISTRY)
