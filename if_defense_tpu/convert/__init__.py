"""Converters from the reference's pretrained PyTorch weights to flax params.

These exist for accuracy parity: the reference ships/distributes pretrained
`.pth` files (PU-Net `pu-in_1024-up_4.pth`, ONet `onet.pth`, ConvONet
`convonet.pth`, victim classifiers) whose weights must load into the
TPU-native modules bit-for-bit.
"""
