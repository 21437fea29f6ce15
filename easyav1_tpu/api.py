"""Public API layer — placeholder, implemented after the codec layers."""

class EasyAV1:  # pragma: no cover - stub
    pass
