from . import mrc, ctf, image  # noqa: F401
