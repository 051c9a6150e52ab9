from .fc import FCNet, FCResNet, FCPoseDecoder, FCResNetPoseDecoder  # noqa
from .resnet import ResNet, ENCODER_ARCH, build_encoder  # noqa
