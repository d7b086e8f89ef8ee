from . import hashing, tags, text  # noqa: F401
