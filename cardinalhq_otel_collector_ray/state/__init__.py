from .manifest import Manifest, ManifestEntry  # noqa: F401
