from . import native_audio  # noqa: F401
