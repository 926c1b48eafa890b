from . import imageio, voxio
