from .datasets import ImagesFolder, ImagesFolderGT, natsorted  # noqa: F401
from .transforms import preprocess_image, degamma  # noqa: F401
