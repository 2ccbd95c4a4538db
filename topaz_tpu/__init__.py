"""topaz_tpu — TPU-native cryo-EM particle picking and denoising framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of tbepler/topaz:
  * positive-unlabeled particle picker training (PN / GE-KL / GE-binomial / PU)
  * dense fully-convolutional micrograph scoring + on-device non-maximum
    suppression for particle extraction
  * noise2noise U-Net denoising of 2D micrographs and 3D tomograms
  * Fourier-crop downsampling and 2-component-GMM intensity normalization
  * MRC / STAR / BOX / CSV / EMAN2-JSON I/O and format conversion

Design notes (TPU-first, not a port):
  * all hot compute paths are pure jittable functions on jnp arrays
  * the picker is *always* defined in its dense ("filled") form — dilated
    valid convolutions — so one architecture serves both training-crop
    classification and whole-micrograph scoring (replacing the reference's
    mutable fill()/unfill() protocol, topaz/model/features/resnet.py:227-251)
  * scale-out is a jax.sharding.Mesh with a `data` axis (micrograph batch)
    and a `space` axis (spatial halo sharding for volumes), not process pools
"""

__version__ = "0.1.0"
