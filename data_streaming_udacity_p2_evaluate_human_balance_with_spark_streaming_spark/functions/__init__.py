from . import hashing, vectors  # noqa: F401
