"""bgn_tpu: a TPU-native BGN (Boneh-Goh-Nissim) somewhat-homomorphic
encryption framework built on JAX/XLA/Pallas.

Capabilities mirror sachaservan/bgn (see SURVEY.md): composite-order
bilinear-pairing BGN with one homomorphic multiplication, BSGS decryption,
polynomial/fixed-point plaintext encodings, ZK gadgets, serialization -- all
re-designed TPU-first: ciphertexts live in batched limb arrays, every scheme
op is a batched XLA/Pallas kernel, and scaling is expressed with
jax.sharding meshes.
"""
__version__ = "0.1.0"
