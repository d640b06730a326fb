from . import codec, synth  # noqa: F401
