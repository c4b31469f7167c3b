from . import kernels, blur, resample, sampling, composite, sobel, sh  # noqa: F401
