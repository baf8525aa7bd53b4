from .schedule import ReduceLROnPlateau, EarlyStopping  # noqa: F401
