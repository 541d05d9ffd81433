# Mask R-CNN on DeepFashion In-shop (15 clothing categories)
# (reference configs/deepfashion/mask-rcnn_r50_fpn_15e_deepfashion.py).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
data_root = 'data/DeepFashion/In-shop/'
model = dict(num_classes=15)
train_dataloader = dict(
    dataset=dict(type='DeepFashionDataset',
                 ann_file='Anno/segmentation/'
                 'DeepFashion_segmentation_train.json',
                 img_prefix='Img/', with_mask=True))
val_dataloader = dict(
    dataset=dict(type='DeepFashionDataset',
                 ann_file='Anno/segmentation/'
                 'DeepFashion_segmentation_query.json',
                 img_prefix='Img/'))
test_dataloader = val_dataloader
train_cfg = dict(epochs=15)
optim = dict(milestones_epochs=(8, 11))
