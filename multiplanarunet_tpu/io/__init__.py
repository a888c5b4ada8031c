from multiplanarunet_tpu.io import nifti
from multiplanarunet_tpu.io.nifti import NiftiImage, Nifti1Image, load, save
