"""Framework exceptions (reference core/exceptions.py surface)."""


class NoDetectionsFound(Exception):
    """Raised when an inference pass yields zero valid detections
    (reference core/exceptions.py:14-16; unused there, available here)."""
