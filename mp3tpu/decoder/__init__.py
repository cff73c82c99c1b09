from .layer3 import decode_mp3  # noqa: F401
