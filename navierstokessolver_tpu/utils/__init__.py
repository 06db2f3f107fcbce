from .metrics import StepLogger, WindowStats  # noqa: F401
