from .app import TransitAPI  # noqa: F401
