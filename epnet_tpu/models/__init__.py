from .backbone import PointBackbone
from .epnet import EPNet
from .proposal import ProposalLayer
from .rcnn import RCNNNet
from .rpn import RPN
from .target_assign import proposal_target_layer

__all__ = ['EPNet', 'PointBackbone', 'ProposalLayer', 'RCNNNet', 'RPN',
           'proposal_target_layer']
