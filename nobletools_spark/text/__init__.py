from . import porter, resources, tools  # noqa: F401
