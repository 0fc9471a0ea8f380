"""Test-only torch oracles replicating the reference architectures
(alphapose/models/{simplepose,fastpose,hrnet}.py and layers/), used to
validate the Flax implementations + checkpoint converter: random torch
weights -> convert -> identical forward outputs.
"""

import torch
import torch.nn as nn

BN = lambda c: nn.BatchNorm2d(c, momentum=0.1)


class SELayer(nn.Module):
    def __init__(self, channel, reduction=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(channel, channel // reduction), nn.ReLU(inplace=True),
            nn.Linear(channel // reduction, channel), nn.Sigmoid())

    def forward(self, x):
        b, c, _, _ = x.size()
        y = x.mean(dim=(2, 3))
        y = self.fc(y).view(b, c, 1, 1)
        return x * y


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = BN(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = BN(planes)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(out + idt)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, se=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = BN(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = BN(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = BN(planes * 4)
        if se:
            self.se = SELayer(planes * 4)
        self.use_se = se
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.use_se:
            out = self.se(out)
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(out + idt)


class ResNet(nn.Module):
    SPECS = {18: (BasicBlock, (2, 2, 2, 2)), 50: (Bottleneck, (3, 4, 6, 3))}

    def __init__(self, depth=50, se=False):
        super().__init__()
        block, layers = self.SPECS[depth]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = BN(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        self.se = se
        for li, (p, n) in enumerate(zip((64, 128, 256, 512), layers)):
            setattr(self, f"layer{li + 1}",
                    self._make_layer(block, p, n, 1 if li == 0 else 2))

    def _make_layer(self, block, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride,
                          bias=False),
                BN(planes * block.expansion))
        kw = {"se": True} if (self.se and downsample is not None) else {}
        layers = [block(self.inplanes, planes, stride, downsample, **kw)
                  if block is Bottleneck else
                  block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class SimplePose(nn.Module):
    def __init__(self, depth=50, num_joints=17, deconv_dim=(256, 256, 256)):
        super().__init__()
        self.preact = ResNet(depth)
        in_ch = 2048 if depth == 50 else 512
        mods = []
        for d in deconv_dim:
            mods += [nn.ConvTranspose2d(in_ch, d, 4, 2, 1, bias=False),
                     BN(d), nn.ReLU(inplace=True)]
            in_ch = d
        self.deconv_layers = nn.Sequential(*mods)
        self.final_layer = nn.Conv2d(deconv_dim[2], num_joints, 1)

    def forward(self, x):
        return self.final_layer(self.deconv_layers(self.preact(x)))

    def get_embedding(self, x):
        return self.preact(x).mean(dim=(2, 3))


class DUC(nn.Module):
    def __init__(self, inplanes, planes, upscale_factor=2):
        super().__init__()
        self.conv = nn.Conv2d(inplanes, planes, 3, 1, 1, bias=False)
        self.bn = BN(planes)
        self.pixel_shuffle = nn.PixelShuffle(upscale_factor)

    def forward(self, x):
        return self.pixel_shuffle(torch.relu(self.bn(self.conv(x))))


class FastPose(nn.Module):
    def __init__(self, depth=50, num_joints=17, conv_dim=128):
        super().__init__()
        self.preact = ResNet(depth, se=True)
        self.suffle1 = nn.PixelShuffle(2)
        self.duc1 = DUC(512, 1024)
        self.duc2 = DUC(256, 1024 if conv_dim == 256 else 512)
        self.conv_out = nn.Conv2d(conv_dim, num_joints, 3, 1, 1)

    def forward(self, x):
        out = self.suffle1(self.preact(x))
        return self.conv_out(self.duc2(self.duc1(out)))


class HRModule(nn.Module):
    def __init__(self, num_branches, num_blocks, num_inchannels, num_channels,
                 multi_scale_output=True):
        super().__init__()
        self.num_branches = num_branches
        self.multi_scale_output = multi_scale_output
        branches = []
        for i in range(num_branches):
            layers = []
            inc = num_inchannels[i]
            ds = None
            if inc != num_channels[i]:
                ds = nn.Sequential(
                    nn.Conv2d(inc, num_channels[i], 1, bias=False),
                    BN(num_channels[i]))
            layers.append(BasicBlock(inc, num_channels[i], 1, ds))
            for _ in range(1, num_blocks[i]):
                layers.append(BasicBlock(num_channels[i], num_channels[i]))
            branches.append(nn.Sequential(*layers))
        self.branches = nn.ModuleList(branches)
        ch = num_channels
        fuse_layers = []
        for i in range(num_branches if multi_scale_output else 1):
            fl = []
            for j in range(num_branches):
                if j > i:
                    fl.append(nn.Sequential(
                        nn.Conv2d(ch[j], ch[i], 1, 1, 0, bias=False),
                        BN(ch[i]),
                        nn.Upsample(scale_factor=2 ** (j - i), mode="nearest")))
                elif j == i:
                    fl.append(nn.Identity())
                else:
                    convs = []
                    for k in range(i - j):
                        if k == i - j - 1:
                            convs.append(nn.Sequential(
                                nn.Conv2d(ch[j], ch[i], 3, 2, 1, bias=False),
                                BN(ch[i])))
                        else:
                            convs.append(nn.Sequential(
                                nn.Conv2d(ch[j], ch[j], 3, 2, 1, bias=False),
                                BN(ch[j]), nn.ReLU(True)))
                    fl.append(nn.Sequential(*convs))
            fuse_layers.append(nn.ModuleList(fl))
        self.fuse_layers = nn.ModuleList(fuse_layers)

    def forward(self, x):
        x = [b(xi) for b, xi in zip(self.branches, x)]
        out = []
        for i in range(len(self.fuse_layers)):
            y = x[0] if i == 0 else self.fuse_layers[i][0](x[0])
            for j in range(1, self.num_branches):
                y = y + (x[j] if i == j else self.fuse_layers[i][j](x[j]))
            out.append(torch.relu(y))
        return out


class HRNet(nn.Module):
    def __init__(self, stages, num_joints=17, final_conv_kernel=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = BN(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = BN(64)
        ds = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False), BN(256))
        self.layer1 = nn.Sequential(
            Bottleneck(64, 64, 1, ds), *[Bottleneck(256, 64) for _ in range(3)])
        self.stages_cfg = stages
        pre = [256]
        for si, key in enumerate(["STAGE2", "STAGE3", "STAGE4"]):
            scfg = stages[key]
            cur = list(scfg["NUM_CHANNELS"])
            trans = []
            for i in range(scfg["NUM_BRANCHES"]):
                if i < len(pre):
                    if cur[i] != pre[i]:
                        trans.append(nn.Sequential(
                            nn.Conv2d(pre[i], cur[i], 3, 1, 1, bias=False),
                            BN(cur[i]), nn.ReLU(True)))
                    else:
                        trans.append(None)
                else:
                    convs = []
                    for j in range(i + 1 - len(pre)):
                        outc = cur[i] if j == i - len(pre) else pre[-1]
                        convs.append(nn.Sequential(
                            nn.Conv2d(pre[-1], outc, 3, 2, 1, bias=False),
                            BN(outc), nn.ReLU(True)))
                    trans.append(nn.Sequential(*convs))
            setattr(self, f"transition{si + 1}", nn.ModuleList(
                [t if t is not None else nn.Identity() for t in trans]))
            self._trans_none = getattr(self, "_trans_none", {})
            self._trans_none[si + 1] = [t is None for t in trans]
            mods = []
            inch = list(cur)
            last = key == "STAGE4"
            for m in range(scfg["NUM_MODULES"]):
                mso = not (last and m == scfg["NUM_MODULES"] - 1)
                mods.append(HRModule(scfg["NUM_BRANCHES"], scfg["NUM_BLOCKS"],
                                     inch, cur, mso))
                inch = list(cur)
            setattr(self, f"stage{si + 2}", nn.Sequential(*mods))
            pre = cur
        p = 1 if final_conv_kernel == 3 else 0
        self.final_layer = nn.Conv2d(pre[0], num_joints, final_conv_kernel,
                                     1, p)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        ys = [x]
        for si, key in enumerate(["STAGE2", "STAGE3", "STAGE4"]):
            scfg = self.stages_cfg[key]
            trans = getattr(self, f"transition{si + 1}")
            none_mask = self._trans_none[si + 1]
            xs = []
            for i in range(scfg["NUM_BRANCHES"]):
                if none_mask[i]:
                    xs.append(ys[i] if si > 0 else ys[0])
                else:
                    xs.append(trans[i](ys[-1] if si > 0 else ys[0]))
            ys = getattr(self, f"stage{si + 2}")(xs)
        return self.final_layer(ys[0])


class WholeBodyAE(nn.Module):
    def __init__(self, z_dim=4, input_dim=38):
        super().__init__()
        self.encoder = nn.Sequential(
            nn.Linear(input_dim, 24), nn.ReLU(True), nn.Linear(24, 12),
            nn.ReLU(True), nn.Linear(12, 7), nn.ReLU(True),
            nn.Linear(7, z_dim))
        self.decoder = nn.Sequential(
            nn.Linear(z_dim, 7), nn.ReLU(True), nn.Linear(7, 12),
            nn.ReLU(True), nn.Linear(12, 24), nn.ReLU(True),
            nn.Linear(24, input_dim), nn.Sigmoid())

    def forward(self, x):
        return self.decoder(self.encoder(x))
