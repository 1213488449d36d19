"""SegRec CLI driver.

Behavioral spec: /root/reference/SegRec/main.py (:44-99,192-236): resolve
model + mode, build corpus, train, report dev/test metrics, save CTR rows
with WUAUC.

  python -m segmminterest_tpu.segrec.main --model_name ClipWDRec \
      --model_mode CTR --path data --dataset SegMM_CTR \
      --clip_weight_path saved_logits/interest_logits.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os.path as osp

import numpy as np

from .corpus import Corpus
from .feeds import ClipWeights, FeedBuilder
from .models import MODEL_REGISTRY
from .runner import (CTRRunner, LeaveRankingRunner,
                     RankingRunner, RunnerConfig)

logger = logging.getLogger(__name__)

SEQ_MODELS = {"DIN", "DIEN", "CAN", "SDIM", "ETA", "ClipDINRec", "ClipDIENRec",
              "ClipCANRec", "SASRec", "GRU4Rec", "Caser", "NARM", "FPMC",
              "TiSASRec", "ComiRec", "ETA", "ContraRec", "TiMiRec",
              "SRGNN", "CLRec", "FourierTA", "S3Rec",
              "SLRCPlus", "Chorus", "KDA"}
KG_MODELS = {"CFKG", "SLRCPlus", "Chorus", "KDA"}


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", type=str, default="ClipWDRec")
    p.add_argument("--model_mode", type=str, default="CTR",
                   choices=["CTR", "Ranking", "TopK", "Impression"])
    p.add_argument("--path", type=str, default="data")
    p.add_argument("--dataset", type=str, default="SegMM_CTR")
    p.add_argument("--sep", type=str, default="\t")
    p.add_argument("--random_seed", type=int, default=0)
    # runner
    p.add_argument("--epoch", type=int, default=200)
    p.add_argument("--early_stop", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--l2", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--eval_batch_size", type=int, default=512)
    p.add_argument("--optimizer", type=str, default="Adam")
    p.add_argument("--topk", type=str, default="5,10,20,50")
    p.add_argument("--metric", type=str, default="")
    p.add_argument("--main_metric", type=str, default="")
    p.add_argument("--loss_n", type=str, default="")
    p.add_argument("--num_neg", type=int, default=1)
    p.add_argument("--test_all", type=int, default=0,
                   help="full-sort ranking eval over all items with clicked "
                        "items masked -inf (BaseModel.py:200,231-235)")
    p.add_argument("--history_max", type=int, default=20)
    p.add_argument("--time_max", type=int, default=512,
                   help="TiSASRec max time-interval buckets")
    p.add_argument("--buir_momentum", type=float, default=0.995)
    p.add_argument("--model_path", type=str, default="",
                   help="save the best params here after training (msgpack) "
                        "and/or load from here (--load 1), like ReChorus "
                        "BaseModel.save_model/load_model")
    p.add_argument("--load", type=int, default=0,
                   help="initialize from --model_path before training "
                        "(missing file -> train from scratch)")
    p.add_argument("--train", type=int, default=1,
                   help="0: skip training and evaluate the loaded model "
                        "(ReChorus main.py --train 0)")
    p.add_argument("--narm_hidden_size", type=int, default=100)
    p.add_argument("--narm_attention_size", type=int, default=50)
    p.add_argument("--train_max_pos_item", type=int, default=20)
    p.add_argument("--train_max_neg_item", type=int, default=20)
    p.add_argument("--n_blocks", type=int, default=4)
    p.add_argument("--num_hidden_unit", type=int, default=64)
    p.add_argument("--setrank_type", type=str, default="IMSAB")
    p.add_argument("--ranker_name", type=str, default="BPRMF",
                   help="Impression mode: base ranker for rerankers")
    p.add_argument("--ranker_emb_size", type=int, default=64)
    p.add_argument("--ranker_model_path", type=str, default="",
                   help="pretrained base-ranker msgpack (rerankers)")
    p.add_argument("--tuneranker", type=int, default=0)
    p.add_argument("--include_attr", type=int, default=0)
    p.add_argument("--margin", type=float, default=0.0)
    p.add_argument("--time_scalar", type=int, default=60 * 60 * 24 * 100)
    p.add_argument("--stage", type=int, default=2,
                   help="Chorus: 1 KG pretrain, 2 recommendation")
    p.add_argument("--base_method", type=str, default="BPR")
    p.add_argument("--lr_scale", type=float, default=0.1)
    p.add_argument("--category_col", type=str, default="i_category")
    p.add_argument("--n_dft", type=int, default=64)
    p.add_argument("--freq_rand", type=int, default=0)
    p.add_argument("--neg_head_p", type=float, default=0.5)
    p.add_argument("--gamma", type=float, default=-1)
    p.add_argument("--pooling", type=str, default="average")
    p.add_argument("--include_val", type=int, default=1)
    p.add_argument("--s3rec_stage", type=int, default=2,
                   help="1: self-supervised pretrain (save via --model_path);"
                        " 2: finetune (load pretrain via --load 1)")
    p.add_argument("--mip_weight", type=float, default=0.2)
    p.add_argument("--sp_weight", type=float, default=0.5)
    p.add_argument("--mask_ratio", type=float, default=0.2)
    p.add_argument("--t_scalar", type=int, default=60,
                   help="FourierTA time-interval scalar")
    p.add_argument("--timirec_stage", type=str, default="finetune",
                   choices=["pretrain", "finetune"])
    p.add_argument("--timirec_temp", type=float, default=1.0)
    p.add_argument("--timirec_n_layers", type=int, default=1)
    p.add_argument("--contrarec_encoder", type=str, default="BERT4Rec")
    p.add_argument("--contrarec_gamma", type=float, default=1.0)
    p.add_argument("--ctc_temp", type=float, default=1.0)
    p.add_argument("--ccc_temp", type=float, default=0.2)
    p.add_argument("--beta_a", type=int, default=3)
    p.add_argument("--beta_b", type=int, default=3)
    p.add_argument("--comirec_attn_size", type=int, default=8)
    p.add_argument("--comirec_k", type=int, default=2)
    p.add_argument("--comirec_add_pos", type=int, default=1)
    p.add_argument("--sam_interaction_type", type=str, default="SAM2E")
    p.add_argument("--sam_aggregation", type=str, default="concat")
    p.add_argument("--sam_num_layers", type=int, default=1)
    p.add_argument("--sam_use_residual", type=int, default=0)
    p.add_argument("--cin_layers", type=str, default="[8,8]",
                   help="xDeepFM CIN layer sizes")
    p.add_argument("--cin_direct", type=int, default=0,
                   help="xDeepFM CIN direct connections")
    p.add_argument("--dropout", type=float, default=0.0)
    # model
    p.add_argument("--emb_size", type=int, default=64)
    p.add_argument("--layers", type=str, default="[64]")
    p.add_argument("--att_layers", type=str, default="[64]")
    p.add_argument("--dnn_layers", type=str, default="[64]")
    p.add_argument("--adjust_interest_weight", type=int, default=0)
    p.add_argument("--duration_mask", type=int, default=0)
    p.add_argument("--norm_interest_type", type=str, default="none")
    # DCNv2 family (DCNv2.py / ClipDCNv2Rec.py argparse)
    p.add_argument("--cross_layer_num", type=int, default=6)
    p.add_argument("--mixed", type=int, default=1)
    p.add_argument("--structure", type=str, default="parallel",
                   choices=["parallel", "stacked"])
    p.add_argument("--low_rank", type=int, default=64)
    p.add_argument("--expert_num", type=int, default=2)
    p.add_argument("--reg_weight", type=float, default=2.0)
    # AutoInt (AutoInt.py argparse)
    p.add_argument("--num_heads", type=int, default=1)
    p.add_argument("--num_layers", type=int, default=1)
    p.add_argument("--attention_size", type=int, default=32)
    # DIEN / CAN (DIEN.py / CAN.py argparse)
    p.add_argument("--alpha_aux", type=float, default=0.0)
    p.add_argument("--aux_hidden_layers", type=str, default="[64]")
    p.add_argument("--evolving_gru_type", type=str, default="AGRU")
    p.add_argument("--add_historical_situations", type=int, default=0,
                   help="append situation embeddings to history steps and "
                        "candidates (DIN.py:132-141)")
    p.add_argument("--co_action_layers", type=str, default="[4,4]")
    p.add_argument("--induce_vec_size", type=int, default=512)
    p.add_argument("--orders", type=int, default=1)
    # FinalMLP feature selection (FinalMLP.py argparse)
    p.add_argument("--use_fs", type=int, default=1)
    p.add_argument("--fs_hidden_units", type=str, default="[64]")
    p.add_argument("--fs1_context", type=str, default="")
    p.add_argument("--fs2_context", type=str, default="")
    # AdaGIN (AdaGIN.py argparse)
    p.add_argument("--warm_dim", type=int, default=64)
    p.add_argument("--cold_dim", type=int, default=64)
    p.add_argument("--warm_tau", type=float, default=1.0)
    p.add_argument("--cold_tau", type=float, default=0.01)
    p.add_argument("--num_gnn_layers", type=int, default=3)
    p.add_argument("--only_use_last_layer", type=int, default=1)
    p.add_argument("--fi_hidden_units", type=str, default="[64,64]")
    p.add_argument("--w_hidden_units", type=str, default="[64,64]")
    p.add_argument("--contrastive", type=str, default="",
                   choices=["", "ContrastiveLoss", "infoNCELoss"],
                   help="ClipRec feats-vs-id alignment aux loss")
    p.add_argument("--auxillary_loss_weight", type=float, default=0.0)
    # segment integration inputs
    p.add_argument("--clip_weight_path", type=str, default="")
    p.add_argument("--eval_neg_weight_path", type=str, default="")
    p.add_argument("--clip_feature_memmap", type=str, default="")
    p.add_argument("--lineid_map", type=str, default="")
    p.add_argument("--save_final_results", type=int, default=0)
    p.add_argument("--result_dir", type=str, default="results")
    # SkipPredBaseline fork features (ReChorus/src/main.py:39,105-141 and
    # helpers/BaseRunner.py:52-114)
    p.add_argument("--use_mesh", type=int, default=1,
                   help="shard batches over all devices on a ('data','model') "
                        "mesh when >1 device is visible and the batch sizes "
                        "divide the device count")
    p.add_argument("--leave_rank", type=int, default=0,
                   help="evaluate with the leave-frame ranking variant")
    p.add_argument("--all_inference", type=int, default=0,
                   help="after training, dump per-candidate prediction "
                        "scores over train/dev/test for the logits converter")
    return p


def build_model(args, corpus, use_frames, kg_meta=None):
    name = args.model_name
    if kg_meta is not None:
        from .kg import (CFKGModel, ChorusModel, KDAModel, SLRCPlusModel,
                         kda_freq_init)
        if name == "CFKG":
            return CFKGModel(user_num=corpus.n_users,
                             entity_num=kg_meta.n_entities,
                             relation_num=kg_meta.n_relations,
                             emb_size=args.emb_size, margin=args.margin)
        if name == "SLRCPlus":
            return SLRCPlusModel(
                user_num=corpus.n_users, item_num=corpus.n_items,
                relation_num=len(kg_meta.item_relations) + 1,
                emb_size=args.emb_size)
        if name == "Chorus":
            cate_col = args.category_col
            meta = kg_meta.item_meta_df
            category_num = (int(meta[cate_col].max()) + 1
                            if cate_col in meta.columns else 1)
            return ChorusModel(
                user_num=corpus.n_users, item_num=corpus.n_items,
                relation_names=tuple(kg_meta.item_relations),
                category_num=category_num, emb_size=args.emb_size,
                margin=args.margin, stage=args.stage,
                base_method=args.base_method)
        if name == "KDA":
            freq_real = freq_imag = None
            n_dft = args.n_dft
            if not args.freq_rand:
                freq_x, n_dft = kda_freq_init(corpus, kg_meta,
                                              n_dft=args.n_dft,
                                              t_scalar=args.t_scalar)
                freq_real, freq_imag = np.real(freq_x), np.imag(freq_x)
            gamma = args.gamma
            if gamma < 0:
                gamma = len(kg_meta.relation_df) / len(corpus.all_df)
            return KDAModel(
                user_num=corpus.n_users, item_num=corpus.n_items,
                entity_num=max(kg_meta.n_entities, corpus.n_items),
                relation_num=kg_meta.n_relations,
                freq_dim=n_dft // 2 + 1, freq_real_init=freq_real,
                freq_imag_init=freq_imag, emb_size=args.emb_size,
                num_layers=args.num_layers, num_heads=args.num_heads,
                attention_size=args.attention_size, pooling=args.pooling,
                include_val=bool(args.include_val), gamma=gamma,
                dropout=args.dropout)
    cls = MODEL_REGISTRY[name]
    feature_names = (corpus.user_feature_names + corpus.item_feature_names
                     + corpus.situation_feature_names
                     + ["user_id", "item_id"])
    layers = json.loads(args.layers)
    dnn_layers = json.loads(args.dnn_layers)
    att_layers = json.loads(args.att_layers)
    seq_kwargs = dict(
        user_features=["user_id"] + corpus.user_feature_names,
        item_features=["item_id"] + corpus.item_feature_names,
        situation_features=corpus.situation_feature_names,
        feature_max=corpus.feature_max, emb_size=args.emb_size,
        dropout=args.dropout)
    clip_kwargs = dict(
        feature_max=corpus.feature_max, dropout=args.dropout,
        adjust_interest_weight=bool(args.adjust_interest_weight),
        duration_mask=bool(args.duration_mask), use_frames=use_frames)
    if name in ("BPRMF", "DirectAU"):
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size)
    if name == "BUIR":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, momentum=args.buir_momentum)
    if name == "NeuMF":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, layers=layers,
                   dropout=args.dropout)
    if name == "LightGCN":
        train = corpus.data_df["train"]
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   edge_users=train["user_id"].to_numpy(np.int32),
                   edge_items=train["item_id"].to_numpy(np.int32),
                   emb_size=args.emb_size)
    if name == "POP":
        pop = np.zeros(corpus.n_items, np.float32)
        for i in corpus.data_df["train"]["item_id"]:
            pop[i] += 1
        return cls(popularity=pop)
    if name == "SASRec":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, history_max=args.history_max,
                   dropout=args.dropout)
    if name in ("GRU4Rec", "FPMC"):
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, dropout=args.dropout)
    if name == "NARM":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size,
                   hidden_size=args.narm_hidden_size,
                   attention_size=args.narm_attention_size,
                   dropout=args.dropout)
    if name == "TiSASRec":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, history_max=args.history_max,
                   time_max=args.time_max, dropout=args.dropout)
    if name == "ContraRec":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, encoder=args.contrarec_encoder,
                   history_max=args.history_max, gamma=args.contrarec_gamma,
                   ccc_temp=args.ccc_temp, dropout=args.dropout)
    if name == "S3Rec":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, history_max=args.history_max,
                   mip_weight=args.mip_weight, sp_weight=args.sp_weight,
                   dropout=args.dropout)
    if name == "CLRec":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, temp=args.ccc_temp,
                   history_max=args.history_max, dropout=args.dropout)
    if name == "FourierTA":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, t_scalar=args.t_scalar,
                   dropout=args.dropout)
    if name == "SRGNN":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, num_layers=args.num_layers,
                   dropout=args.dropout)
    if name == "TiMiRec":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, history_max=args.history_max,
                   attn_size=args.comirec_attn_size, K=args.comirec_k,
                   add_pos=bool(args.comirec_add_pos),
                   temp=args.timirec_temp, n_layers=args.timirec_n_layers,
                   stage=args.timirec_stage, dropout=args.dropout)
    if name == "ComiRec":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, history_max=args.history_max,
                   attn_size=args.comirec_attn_size, K=args.comirec_k,
                   add_pos=bool(args.comirec_add_pos), dropout=args.dropout)
    if name == "Caser":
        return cls(user_num=corpus.n_users, item_num=corpus.n_items,
                   emb_size=args.emb_size, history_max=args.history_max,
                   dropout=args.dropout)
    if name == "FM":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   dropout=args.dropout)
    if name == "DeepFM":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   layers=layers, dropout=args.dropout)
    if name == "AFM":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   attention_size=args.attention_size,
                   reg_weight=args.reg_weight, dropout=args.dropout)
    if name == "SAM":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   interaction_type=args.sam_interaction_type,
                   aggregation=args.sam_aggregation,
                   num_layers=args.sam_num_layers,
                   use_residual=bool(args.sam_use_residual),
                   dropout=args.dropout)
    if name == "xDeepFM":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   layers=layers, cin_layers=json.loads(args.cin_layers),
                   direct=bool(args.cin_direct), reg_weight=args.reg_weight,
                   dropout=args.dropout)
    if name == "WideDeep":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   layers=layers, dropout=args.dropout)
    if name == "DCN":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   layers=layers, dropout=args.dropout,
                   cross_layer_num=args.cross_layer_num)
    if name == "DCNv2":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   layers=layers, dropout=args.dropout,
                   cross_layer_num=args.cross_layer_num,
                   mixed=bool(args.mixed), structure=args.structure,
                   low_rank=args.low_rank, expert_num=args.expert_num,
                   reg_weight=args.reg_weight)
    if name == "AutoInt":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   layers=layers, dropout=args.dropout,
                   attention_size=args.attention_size,
                   num_heads=args.num_heads, num_layers=args.num_layers)
    if name == "FinalMLP":
        ctx = lambda v: tuple(t for t in v.split(",") if t)
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   mlp1_hidden_units=layers, mlp2_hidden_units=layers,
                   dropout=args.dropout, use_fs=bool(args.use_fs),
                   fs_hidden_units=tuple(json.loads(args.fs_hidden_units)),
                   fs1_context=ctx(args.fs1_context),
                   fs2_context=ctx(args.fs2_context),
                   num_heads=args.num_heads)
    if name == "AdaGIN":
        return cls(feature_names, corpus.feature_max, emb_size=args.emb_size,
                   dropout=args.dropout, warm_dim=args.warm_dim,
                   cold_dim=args.cold_dim, warm_tau=args.warm_tau,
                   cold_tau=args.cold_tau,
                   num_gnn_layers=args.num_gnn_layers,
                   only_use_last_layer=bool(args.only_use_last_layer),
                   fi_hidden_units=tuple(json.loads(args.fi_hidden_units)),
                   w_hidden_units=tuple(json.loads(args.w_hidden_units)))
    if name == "DIN":
        return cls(att_layers=att_layers, dnn_layers=dnn_layers,
                   add_historical_situations=bool(
                       args.add_historical_situations), **seq_kwargs)
    if name == "DIEN":
        return cls(fcn_hidden_layers=layers, alpha_aux=args.alpha_aux,
                   add_historical_situations=bool(
                       args.add_historical_situations),
                   aux_hidden_layers=tuple(json.loads(args.aux_hidden_layers)),
                   evolving_gru_type=args.evolving_gru_type, **seq_kwargs)
    if name == "CAN":
        return cls(fcn_hidden_layers=layers, orders=args.orders,
                   induce_vec_size=args.induce_vec_size,
                   co_action_layers=tuple(json.loads(args.co_action_layers)),
                   **seq_kwargs)
    if name == "SDIM":
        return cls(dnn_layers=dnn_layers, **seq_kwargs)
    if name == "ETA":
        return cls(dnn_layers=dnn_layers, history_max=args.history_max,
                   **seq_kwargs)
    if name in ("ClipRec", "ClipWDRec"):
        return cls(emb_dim=args.emb_size, dnn_layers=dnn_layers,
                   contrastive=args.contrastive, **clip_kwargs)
    if name == "ClipDINRec":
        return cls(has_duration="i_duration" in corpus.item_feature_names,
                   emb_size=args.emb_size, att_layers=att_layers,
                   dnn_layers=dnn_layers,
                   norm_interest_type=args.norm_interest_type, **clip_kwargs)
    if name == "ClipDCNv2Rec":
        return cls(emb_size=args.emb_size, layers=layers,
                   cross_layer_num=args.cross_layer_num,
                   mixed=bool(args.mixed), structure=args.structure,
                   low_rank=args.low_rank, expert_num=args.expert_num,
                   reg_weight=args.reg_weight, **clip_kwargs)
    if name == "ClipAutoIntRec":
        return cls(emb_size=args.emb_size, layers=layers, **clip_kwargs)
    if name == "ClipFinalMLPRec":
        return cls(emb_size=args.emb_size, mlp1_hidden_units=layers,
                   mlp2_hidden_units=layers, **clip_kwargs)
    if name == "ClipAdaGINRec":
        return cls(emb_size=args.emb_size, **clip_kwargs)
    if name == "ClipDIENRec":
        return cls(emb_size=args.emb_size, fcn_hidden_layers=layers,
                   evolving_gru_type=args.evolving_gru_type,
                   norm_interest_type=args.norm_interest_type, **clip_kwargs)
    if name == "ClipCANRec":
        return cls(emb_size=args.emb_size, fcn_hidden_layers=layers,
                   evolving_gru_type=args.evolving_gru_type,
                   orders=args.orders, induce_vec_size=args.induce_vec_size,
                   co_action_layers=tuple(json.loads(args.co_action_layers)),
                   norm_interest_type=args.norm_interest_type, **clip_kwargs)
    raise ValueError(f"unknown model {name}")


def run_impression(args):
    """Impression/reranking flow (ReChorus main.py with ImpressionReader/
    ImpressionRunner): base rankers (BPRMF/SASRec Impression variants) train
    directly on impression lists; rerankers (PRM/SetRank/MIR) wrap a frozen
    pretrained ranker restored from --ranker_model_path."""
    from .rerank import (IMPRESSION_RANKERS, RERANKERS,
                         ImpressionFeedBuilder, make_impression_runner)
    corpus = Corpus(args.path, args.dataset, sep=args.sep)
    pos_len, neg_len = args.train_max_pos_item, args.train_max_neg_item
    is_reranker = args.model_name in RERANKERS
    seq_needed = (args.model_name == "MIR"
                  or (is_reranker and args.ranker_name == "SASRec")
                  or args.model_name == "SASRec")
    history_max = args.history_max if seq_needed else 0

    builders = {
        phase: ImpressionFeedBuilder(
            corpus, phase, pos_len=pos_len, neg_len=neg_len,
            history_max=history_max, seed=args.random_seed)
        for phase in ("train", "dev", "test")}

    def make_ranker(name, emb):
        cls = IMPRESSION_RANKERS[name]
        kw = dict(user_num=corpus.n_users, item_num=corpus.n_items,
                  emb_size=emb)
        if name == "SASRec":
            kw.update(num_heads=args.num_heads,
                      history_max=args.history_max)
        return cls(**kw)

    if is_reranker:
        ranker = make_ranker(args.ranker_name, args.ranker_emb_size)
        cls = RERANKERS[args.model_name]
        kw = dict(item_num=corpus.n_items, ranker=ranker,
                  ranker_emb_size=args.ranker_emb_size,
                  pos_len=pos_len, neg_len=neg_len,
                  emb_size=args.emb_size, num_heads=args.num_heads,
                  num_hidden_unit=args.num_hidden_unit,
                  dropout=args.dropout, tuneranker=bool(args.tuneranker))
        if args.model_name in ("PRM", "SetRank"):
            kw["n_blocks"] = args.n_blocks
        if args.model_name == "SetRank":
            kw["setrank_type"] = args.setrank_type
        model = cls(**kw)
    else:
        model = make_ranker(args.model_name, args.emb_size)

    metrics = args.metric or "NDCG,MAP,HR"
    cfg = RunnerConfig(
        epoch=args.epoch, early_stop=args.early_stop, lr=args.lr,
        l2=args.l2, batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size, optimizer=args.optimizer,
        topk=tuple(int(x) for x in args.topk.split(",")),
        metrics=tuple(m.strip().upper() for m in metrics.split(",")),
        main_metric=args.main_metric,
        loss_n=args.loss_n or "BPRsession", seed=args.random_seed)
    runner = make_impression_runner(model, cfg, pos_len, neg_len)

    if is_reranker and args.ranker_model_path:
        example = next(builders["train"].batches(cfg.batch_size))
        state = runner.init_state(example)
        state = runner.load_ranker(state, args.ranker_model_path)
        best_state, history = (
            _impression_train_from(runner, builders, state)
            if args.train else (state, None))
    else:
        best_state, history = runner.train(
            builders,
            init_path=args.model_path if (args.load or not args.train)
            else "", do_train=bool(args.train))
    if args.model_path and args.train:
        runner.save_state(best_state, args.model_path)
    dev_res = runner.evaluate(builders["dev"], best_state)
    test_res = runner.evaluate(builders["test"], best_state)
    logger.info("Dev  After Training: %s", dev_res)
    logger.info("Test After Training: %s", test_res)
    return {"dev": dev_res, "test": test_res}


def _impression_train_from(runner, builders, state):
    """runner.train() but starting from a pre-initialized state (the
    ranker-absorbed one) instead of a fresh init."""
    import jax
    import numpy as _np
    main_results, dev_results = [], []
    best_state = jax.tree.map(_np.asarray, state)
    for epoch in range(runner.cfg.epoch):
        state, loss = runner.fit(builders["train"], state, epoch + 1)
        dev_result = runner.evaluate(builders["dev"], state)
        dev_results.append(dev_result)
        main_results.append(dev_result[runner.main_metric])
        star = ""
        if max(main_results) == main_results[-1]:
            best_state = jax.tree.map(_np.asarray, state)
            star = " *"
        logger.info("Epoch %-4d loss=%.4f dev=%s%s", epoch + 1, loss,
                    dev_result, star)
        if runner.eval_termination(main_results, runner.cfg.early_stop):
            logger.info("Early stop at %d based on dev result.", epoch + 1)
            break
    return best_state, {"main_results": main_results,
                        "dev_results": dev_results}


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    args = build_parser().parse_args(argv)
    if args.model_mode == "Impression":
        return run_impression(args)
    task = "ctr" if args.model_mode == "CTR" else "ranking"

    corpus = Corpus(args.path, args.dataset, sep=args.sep)
    # dense -> raw id maps: logit-key lookup (SegRec/models/BaseModel.py:132-136)
    # and raw-id re-mapping of saved results (SegRec/main.py:148-187)
    id2user = id2item = None
    base = osp.join(args.path, args.dataset)
    if osp.exists(osp.join(base, "id2user.json")):
        with open(osp.join(base, "id2user.json")) as f:
            id2user = json.load(f)
        with open(osp.join(base, "id2item.json")) as f:
            id2item = json.load(f)
    clip_weights = None
    if args.clip_weight_path:
        clip_weights = ClipWeights(args.clip_weight_path,
                                   id2user=id2user, id2item=id2item,
                                   neg_weight_path=args.eval_neg_weight_path)
    feat_table = None
    store = None
    if args.clip_feature_memmap and args.lineid_map:
        from ..data.feature_store import FeatureStore
        store = FeatureStore.open(args.clip_feature_memmap, args.lineid_map)
        feat_table = np.asarray(store.feat)

    include_history = args.model_name in SEQ_MODELS
    kg_meta = None
    if args.model_name in KG_MODELS:
        from .kg import KGFeedBuilder, KGMeta
        kg_meta = KGMeta(args.path, args.dataset, sep=args.sep,
                         include_attr=bool(args.include_attr),
                         n_items=corpus.n_items)

        def kg_mode_for(phase):
            name = args.model_name
            if name == "CFKG":
                return "cfkg"
            if name == "SLRCPlus":
                return "slrc"
            if name == "KDA":
                return "kda"
            return "chorus_kg" if (args.stage == 1
                                   and phase == "train") else "chorus"
    builders = {}
    for phase in ("train", "dev", "test"):
        if kg_meta is not None:
            builders[phase] = KGFeedBuilder(
                corpus, phase, kg=kg_meta, kg_mode=kg_mode_for(phase),
                time_scalar=args.time_scalar,
                category_col=args.category_col, t_scalar=args.t_scalar,
                num_neg_kg=args.num_neg, neg_head_p=args.neg_head_p,
                task=task, num_neg=args.num_neg,
                history_max=args.history_max,
                include_history=include_history,
                test_all=bool(args.test_all) and phase != "train",
                seed=args.random_seed)
            continue
        builders[phase] = FeedBuilder(
            corpus, phase, task=task, num_neg=args.num_neg,
            history_max=args.history_max, include_history=include_history,
            neg_history=(args.alpha_aux > 0 and include_history),
            augment_history=(args.model_name == "ContraRec"),
            session_graph=(args.model_name == "SRGNN"),
            s3rec_pretrain=(args.model_name == "S3Rec"
                            and args.s3rec_stage == 1
                            and phase == "train"),
            s3rec_mask_ratio=args.mask_ratio,
            beta_a=args.beta_a, beta_b=args.beta_b,
            test_all=bool(args.test_all) and phase != "train"
            and task == "ranking",
            clip_weights=clip_weights, feature_store=store,
            seed=args.random_seed)

    use_frames = store is not None
    model = build_model(args, corpus, use_frames, kg_meta=kg_meta)

    metrics = args.metric or ("AUC,F1_SCORE,LOG_LOSS,ACC"
                              if task == "ctr" else "NDCG,HR")
    cfg = RunnerConfig(
        epoch=args.epoch, early_stop=args.early_stop, lr=args.lr, l2=args.l2,
        batch_size=args.batch_size, eval_batch_size=args.eval_batch_size,
        optimizer=args.optimizer,
        topk=tuple(int(x) for x in args.topk.split(",")),
        metrics=tuple(m.strip().upper() for m in metrics.split(",")),
        main_metric=args.main_metric,
        loss_n=args.loss_n or (
            "BCE" if task == "ctr"
            else "BUIR" if args.model_name == "BUIR"
            else "ContraRec" if args.model_name == "ContraRec"
            else "CLRec" if args.model_name == "CLRec"
            else "S3Rec" if (args.model_name == "S3Rec"
                             and args.s3rec_stage == 1)
            else "CFKG" if args.model_name == "CFKG"
            else "ChorusKG" if (args.model_name == "Chorus"
                                and args.stage == 1) else "BPR"),
        ctc_temp=args.ctc_temp, margin=args.margin,
        auxillary_loss_weight=args.auxillary_loss_weight,
        seed=args.random_seed)
    mesh = None
    if args.use_mesh:
        import jax
        from ..core.mesh import make_mesh
        n_dev = len(jax.devices())
        if (n_dev > 1 and args.batch_size % n_dev == 0
                and args.eval_batch_size % n_dev == 0):
            mesh = make_mesh(jax.devices())
            logger.info("batch sharding over %d devices", n_dev)

    if task == "ctr":
        runner = CTRRunner(model, cfg, feat_table=feat_table, mesh=mesh)
    elif args.model_name == "Chorus" and args.stage == 2:
        from .kg import make_chorus_runner
        runner = make_chorus_runner(model, cfg, args.lr_scale, mesh=mesh)
    elif args.leave_rank:
        runner = LeaveRankingRunner(model, cfg, feat_table=feat_table,
                                    data_name=args.dataset, mesh=mesh)
    else:
        runner = RankingRunner(model, cfg, feat_table=feat_table, mesh=mesh)

    best_state, history = runner.train(
        builders,
        init_path=args.model_path if (args.load or not args.train) else "",
        do_train=bool(args.train))
    if args.model_path and args.train:
        runner.save_state(best_state, args.model_path)
    dev_res = runner.evaluate(builders["dev"], best_state)
    test_res = runner.evaluate(builders["test"], best_state)
    logger.info("Dev  After Training: %s", dev_res)
    logger.info("Test After Training: %s", test_res)
    result = {"dev": dev_res, "test": test_res}
    if args.save_final_results and task == "ctr":
        import os
        import pandas as pd
        os.makedirs(args.result_dir, exist_ok=True)
        preds, labels, users = runner.predict(builders["test"], best_state)
        wuauc = test_res.get("WUAUC", 0.0)
        out_path = osp.join(
            args.result_dir,
            f"rec-{args.model_name}{args.model_mode}-test_wuauc={wuauc}.csv")
        if id2user is not None:  # raw ids on save (SegRec/main.py:148-187)
            users = [id2user.get(str(u), u) for u in users]
        pd.DataFrame({"user_id": users, "pCTR": preds,
                      "label": labels}).to_csv(out_path, sep="\t", index=False)
        logger.info("saved CTR predictions to %s", out_path)
    if args.all_inference:
        # per-candidate score export for convert_baseline_logits
        # (ReChorus fork main.py:105-141)
        import os
        import pandas as pd
        os.makedirs(args.result_dir, exist_ok=True)
        rows = []
        for phase in ("train", "dev", "test"):
            b = builders[phase]
            if phase == "train" and task == "ranking":
                b.actions_before_epoch()
            preds = runner.predict(b, best_state)
            if preds.ndim == 1:
                preds = preds[:, None]
            n = len(b)
            items = b._candidates(np.arange(n))
            for r in range(n):
                for c in range(items.shape[1]):
                    rows.append((int(b.user_id[r]), int(b.time[r]),
                                 int(items[r, c]), float(preds[r, c])))
        out_path = osp.join(args.result_dir,
                            f"inference_scores-{args.model_name}"
                            f"{args.model_mode}.csv")
        pd.DataFrame(rows, columns=["user_id", "time", "item_id",
                                    "predictions"]).to_csv(
            out_path, sep="\t", index=False)
        logger.info("saved inference scores to %s", out_path)
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
