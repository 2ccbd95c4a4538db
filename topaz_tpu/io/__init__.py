from topaz_tpu.io import mrc
from topaz_tpu.io.image import load_image, save_image, downsample_file
