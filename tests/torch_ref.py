"""Helpers for golden-parity tests against the torch reference at
/root/reference (read-only). The reference is imported — never copied — to
generate activations that our TPU-native modules must reproduce."""

import sys

import numpy as np

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

# The reference UNet ctor imports omegaconf (not installed here) when
# context_dim is set; a list-typed stub satisfies it for golden generation.
if "omegaconf" not in sys.modules:
    import types

    omegaconf = types.ModuleType("omegaconf")
    listconfig = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    listconfig.ListConfig = ListConfig
    omegaconf.listconfig = listconfig
    sys.modules["omegaconf"] = omegaconf
    sys.modules["omegaconf.listconfig"] = listconfig


def torch_manual_seed(seed=0):
    import torch

    torch.manual_seed(seed)
    return torch


def nchw_to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def t2n(t):
    return t.detach().cpu().numpy()


def run_torch(module, *args):
    import torch

    module.eval()
    with torch.no_grad():
        return module(*args)
