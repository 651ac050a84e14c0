from .server import Request, Completion, SpecServer  # noqa: F401
from .http import HttpFrontend  # noqa: F401
