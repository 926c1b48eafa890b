from . import checkpoint, imageio, voxio
