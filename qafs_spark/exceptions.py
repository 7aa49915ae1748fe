"""Exception types for the qafs-spark feature store.

Mirrors the reference exception surface (reference: src/qafs/exceptions.py:1-16)
with one addition, :class:`SchemaError`, raised by native data-quality check
enforcement (the reference delegates this to pandera.errors.SchemaError).
"""


class FeatureStoreException(Exception):
    """General feature store exception."""


class RemoteFeatureStoreException(FeatureStoreException):
    """Errors talking to remote storage."""


class MissingFeatureException(FeatureStoreException):
    """The requested feature/namespace does not exist."""


class SchemaError(FeatureStoreException):
    """A data-quality check failed on write.

    Native replacement for pandera.errors.SchemaError (reference:
    src/qafs/core.py:423). Carries the per-check violation counts so callers
    can report exactly what failed without re-running the job.
    """

    def __init__(self, message, failures=None):
        super().__init__(message)
        self.failures = failures or {}
