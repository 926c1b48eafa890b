from . import camera, march, render, sampling, shade, vecmath
