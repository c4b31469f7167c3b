from .base import SceneData, load_dataset  # noqa: F401
