from .server import Request, Completion, SpecServer  # noqa: F401
