"""Reference-semantics torch-CPU training step (BASELINE.md measurement
protocol, step 1).

This is OUR re-derivation of the reference's semantics (SURVEY.md §3a) in
torch — used as (a) the throughput denominator for the >=8x/chip target and
(b) a numerical parity oracle in tests. It is written from the SURVEY.md
behavioral spec, not copied from the (empty) reference mount.

Run: python tools/torch_reference.py --steps 3 --size 256
Prints one JSON line: {"torch_cpu_steps_per_sec": ...}
"""

from __future__ import annotations

import argparse
import itertools
import json
import time

import torch
import torch.nn as nn


def conv_in_relu(i, o, k, s, p, reflect=False, norm=nn.InstanceNorm2d):
    layers = []
    if reflect:
        layers.append(nn.ReflectionPad2d(p))
        p = 0
    layers += [nn.Conv2d(i, o, k, s, p), norm(o), nn.ReLU(True)]
    return layers


class ResBlock(nn.Module):
    def __init__(self, c, norm=nn.InstanceNorm2d):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(c, c, 3), norm(c),
            nn.ReLU(True),
            nn.ReflectionPad2d(1), nn.Conv2d(c, c, 3), norm(c))

    def forward(self, x):
        return x + self.block(x)


class ResnetG(nn.Module):
    def __init__(self, in_nc, out_nc, ngf=64, n_blocks=9, tanh=True,
                 norm=nn.InstanceNorm2d):
        super().__init__()
        layers = conv_in_relu(in_nc, ngf, 7, 1, 3, reflect=True, norm=norm)
        layers += conv_in_relu(ngf, ngf * 2, 3, 2, 1, norm=norm)
        layers += conv_in_relu(ngf * 2, ngf * 4, 3, 2, 1, norm=norm)
        layers += [ResBlock(ngf * 4, norm=norm) for _ in range(n_blocks)]
        for c_in, c_out in [(ngf * 4, ngf * 2), (ngf * 2, ngf)]:
            layers += [nn.ConvTranspose2d(c_in, c_out, 3, 2, 1, output_padding=1),
                       norm(c_out), nn.ReLU(True)]
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_nc, 7)]
        if tanh:
            layers.append(nn.Tanh())
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class UnetBlock(nn.Module):
    """U-Net skip block mirroring the reference's UnetSkipConnectionBlock."""

    def __init__(self, outer_nc, inner_nc, input_nc, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        down_conv = nn.Conv2d(input_nc, inner_nc, 4, 2, 1)
        if outermost:
            up = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            self.model = nn.Sequential(down_conv, submodule, nn.ReLU(True), up)
        elif innermost:
            up = nn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1)
            self.model = nn.Sequential(
                nn.LeakyReLU(0.2, True), down_conv, nn.ReLU(True), up,
                nn.InstanceNorm2d(outer_nc))
        else:
            up = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            self.model = nn.Sequential(
                nn.LeakyReLU(0.2, True), down_conv, nn.InstanceNorm2d(inner_nc),
                submodule, nn.ReLU(True), up, nn.InstanceNorm2d(outer_nc))

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class UnetG(nn.Module):
    def __init__(self, in_nc, out_nc, num_downs=7, ngf=64, tanh=True):
        super().__init__()
        block = UnetBlock(ngf * 8, ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = UnetBlock(ngf * 8, ngf * 8, ngf * 8, submodule=block)
        block = UnetBlock(ngf * 4, ngf * 8, ngf * 4, submodule=block)
        block = UnetBlock(ngf * 2, ngf * 4, ngf * 2, submodule=block)
        block = UnetBlock(ngf, ngf * 2, ngf, submodule=block)
        block = UnetBlock(out_nc, ngf, in_nc, submodule=block, outermost=True)
        self.model = block
        self.tanh = tanh

    def forward(self, x):
        y = self.model(x)
        return torch.tanh(y) if self.tanh else y


class PixelD(nn.Module):
    def __init__(self, in_nc, ndf=64):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(in_nc, ndf, 1), nn.LeakyReLU(0.2, True),
            nn.Conv2d(ndf, ndf * 2, 1), nn.InstanceNorm2d(ndf * 2),
            nn.LeakyReLU(0.2, True), nn.Conv2d(ndf * 2, 1, 1))

    def forward(self, x):
        return self.net(x)


class PatchD(nn.Module):
    def __init__(self, in_nc, ndf=64, n_layers=3, norm=nn.InstanceNorm2d):
        super().__init__()
        layers = [nn.Conv2d(in_nc, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
        nf = ndf
        for i in range(1, n_layers):
            nf_new = min(ndf * 2 ** i, ndf * 8)
            layers += [nn.Conv2d(nf, nf_new, 4, 2, 1), norm(nf_new),
                       nn.LeakyReLU(0.2, True)]
            nf = nf_new
        nf_new = min(ndf * 2 ** n_layers, ndf * 8)
        layers += [nn.Conv2d(nf, nf_new, 4, 1, 1), norm(nf_new),
                   nn.LeakyReLU(0.2, True), nn.Conv2d(nf_new, 1, 4, 1, 1)]
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


def build(num_classes=21, in_ch=3, ngf=64, ndf=64, n_blocks=9):
    G_i2l = ResnetG(in_ch, num_classes, ngf, n_blocks, tanh=False)
    G_l2i = ResnetG(num_classes, in_ch, ngf, n_blocks, tanh=True)
    D_img = PatchD(in_ch, ndf)
    D_lab = PatchD(num_classes, ndf)
    return G_i2l, G_l2i, D_img, D_lab


class HostPool:
    """Reference ``Sample_from_Pool`` semantics as a host-side list (the
    reference keeps the replay pool in Python — SURVEY.md §2 utilities row).

    Per incoming fake: while the pool has fewer than ``max_size`` items,
    store and return the new one; once full, either return the new one
    untouched (use_new) or swap it with stored item ``idx`` (return the old,
    store the new). Decisions are INJECTED — ``query`` takes one
    (use_new, idx) pair per item — so the same decision stream can drive
    this host pool and the jax device pool
    (cyclegan_tpu.train.pool.pool_query_with_decisions) for end-to-end
    replay parity (tests/test_pool_parity.py).
    """

    def __init__(self, max_size: int):
        self.max_size = max_size
        self.items: list[torch.Tensor] = []

    def query(self, batch: torch.Tensor, decisions) -> torch.Tensor:
        outs = []
        for item, (use_new, idx) in zip(batch, decisions):
            item = item.detach().clone()
            if len(self.items) < self.max_size:
                self.items.append(item)
                outs.append(item)
            elif use_new:
                outs.append(item)
            else:
                old = self.items[int(idx)]
                self.items[int(idx)] = item
                outs.append(old)
        return torch.stack(outs)


def train_step(models, opts, batch, lamda=10.0, pools=None,
               pool_decisions=None):
    """One G+D alternating update with the reference's loss structure.

    ``pools=(img_pool, lab_pool)`` (HostPool) + ``pool_decisions=
    (img_decisions, lab_decisions)`` route the detached fakes through the
    replay pools before the D step — the reference's pool-active hot loop.
    Default None keeps the pool-free path (the conservative throughput
    denominator — see the D-step comment below)."""
    G_i2l, G_l2i, D_img, D_lab = models
    g_opt, d_opt = opts
    lab_img, lab_lab, unlab_img, lab_oh = batch
    mse, l1, ce = nn.MSELoss(), nn.L1Loss(), nn.CrossEntropyLoss(ignore_index=255)

    # G step (D frozen)
    for p in itertools.chain(D_img.parameters(), D_lab.parameters()):
        p.requires_grad_(False)
    g_opt.zero_grad()
    fake_lab = torch.softmax(G_i2l(unlab_img), 1)
    fake_img = G_l2i(lab_oh)
    # Single D forward per term (a `ones_like(D(x))` target would run D
    # twice and double-record batch-norm running stats under --norm batch).
    dl_out, di_out = D_lab(fake_lab), D_img(fake_img)
    adv = mse(dl_out, torch.ones_like(dl_out)) + \
          mse(di_out, torch.ones_like(di_out))
    cyc_img = l1(G_l2i(fake_lab), unlab_img) * lamda
    cyc_lab = ce(G_i2l(fake_img), lab_lab) * lamda
    sup = ce(G_i2l(lab_img), lab_lab)
    (adv + cyc_img + cyc_lab + sup).backward()
    g_opt.step()
    for p in itertools.chain(D_img.parameters(), D_lab.parameters()):
        p.requires_grad_(True)

    # D step (no pool by default — pool adds host work in the reference;
    # omitting it makes this baseline *faster*, i.e. conservative for the
    # >=8x target. Pass pools+pool_decisions for the pool-active loop.)
    d_opt.zero_grad()
    fl, fi = fake_lab.detach(), fake_img.detach()
    if pools is not None:
        img_pool, lab_pool = pools
        dec_img, dec_lab = pool_decisions
        fi = img_pool.query(fi, dec_img)
        fl = lab_pool.query(fl, dec_lab)
    di_real, di_fake = D_img(unlab_img), D_img(fi)
    dl_real, dl_fake = D_lab(lab_oh), D_lab(fl)
    d_img_loss = 0.5 * (mse(di_real, torch.ones_like(di_real))
                        + mse(di_fake, torch.zeros_like(di_fake)))
    d_lab_loss = 0.5 * (mse(dl_real, torch.ones_like(dl_real))
                        + mse(dl_fake, torch.zeros_like(dl_fake)))
    d_loss = d_img_loss + d_lab_loss
    d_loss.backward()
    d_opt.step()
    # Loss values as computed during the update (pre-update params on both
    # phases — same convention as the jax step's metrics dict).
    return {"g_total": float(adv + cyc_img + cyc_lab + sup),
            "g_adv": float(adv), "g_sup": float(sup),
            "d_img": float(d_img_loss), "d_lab": float(d_lab_loss),
            "d_total": float(d_loss)}


def measure(size=256, batch=1, steps=3, warmup=1, num_classes=21):
    torch.manual_seed(0)
    models = build(num_classes)
    params_g = itertools.chain(models[0].parameters(), models[1].parameters())
    params_d = itertools.chain(models[2].parameters(), models[3].parameters())
    opts = (torch.optim.Adam(params_g, 2e-4, betas=(0.5, 0.999)),
            torch.optim.Adam(params_d, 2e-4, betas=(0.5, 0.999)))
    lab_lab = torch.randint(0, num_classes, (batch, size, size))
    batch_t = (
        torch.randn(batch, 3, size, size),
        lab_lab,
        torch.randn(batch, 3, size, size),
        torch.nn.functional.one_hot(lab_lab, num_classes).permute(0, 3, 1, 2).float(),
    )
    for _ in range(warmup):
        train_step(models, opts, batch_t)
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step(models, opts, batch_t)
    dt = time.perf_counter() - t0
    return steps / dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    sps = measure(args.size, args.batch, args.steps)
    print(json.dumps({"torch_cpu_steps_per_sec": sps, "size": args.size,
                      "batch": args.batch}))
