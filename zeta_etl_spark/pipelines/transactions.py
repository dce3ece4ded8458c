"""Transaction-analytics pipeline: the engine's re-expression of the
reference's workhorse DLT pipeline
(dlt-pipelines/zetadex-transactions-helius-pipeline.py) on the open-source
runner — bronze ingest → cleaned → per-instruction silver tables → hourly
gold → 24h rolling gold-batch.

Reference parity map (file:line of the original):
- bronze schema (nested instructions/events, map payloads): :255-278
- cleaned_transactions (filter is_successful, date_/hour_): :340-358
- posexplode(instructions) + name predicates: :377-379,465-471
- explode(instruction.events) + event-name filter: :473-474,532-533
- stream-static dim joins (markets, zetagroup_mapping): :380-387,475-479
- deposit/withdraw scaling by PRICE_FACTOR: :388-399
- maker/taker trade split + union: :646-719
- place_order_event + trade_event merge — the reference's ONLY Python UDF
  (:310-329, used at :671) — replaced here with pure higher-order-function
  column expressions (filter + element_at + map_concat), keeping the whole
  plan inside whole-stage codegen (SURVEY §2.10).
- hourly gold agg under event-time buckets: :777-818
- 24h rolling over densified spine: :829-855
- withdraw family (prefix filter + amount scaling): :401-441
- order-complete family (4-way name predicate + order_complete_event +
  markets dim join + coalesce(asset, upper(event.asset))): :504-556
- liquidation family (liquidate* + liquidation_event, signed-size→side,
  reward/size scaling): :558-625
- funding family (apply_funding_event + nonzero balance_change): :723-760
- user-hourly deposit/withdraw golds: :866-911
- funding-rate user-asset hourly gold (exact-sum avg): :923-946
- fee tiers (30d range window + 8-branch tier/multiplier when-chains +
  latest-per-authority): :1891-1945 — wall-clock filter replaced by the
  engine clock rule (clock.py): explicit/env clock, else data max.

Scale notes: instruction/event explodes happen before the dim joins so the
join keys are scalar; dims are broadcast; hourly gold is a single shuffle on
(hour, asset); the rolling node re-reads the (small) gold table rather than
re-scanning bronze.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from zeta_etl_spark.functions import dec_avg, dec_sum
from zeta_etl_spark.plans.graph import Pipeline
from zeta_etl_spark.operators.scalar_frame import with_scalar_frame

PRICE_FACTOR = 1_000_000  # zetadex-transactions-helius-pipeline.py:20
SIZE_FACTOR = 1_000  # :21

TRANSACTIONS_SCHEMA = (
    "signature string, "
    "instructions array<struct<"
    "  name string, args map<string,string>, "
    "  accounts struct<named map<string,string>, remaining array<string>>, "
    "  program_id string, "
    "  events array<struct<name string, event map<string,string>>>>>, "
    "is_successful boolean, slot bigint, block_time timestamp_ntz, fee int"
)

MARKETS_SCHEMA = (
    "underlying string, market_pub_key string, strike double, kind string, "
    "active_timestamp timestamp_ntz, expiry_timestamp timestamp_ntz"
)

ZETAGROUP_SCHEMA = "zetagroup_pub_key string, underlying string"


def build_transactions_pipeline(
    spark: SparkSession,
    base_path: str,
    raw: DataFrame,
    markets: DataFrame,
    zetagroup_mapping: DataFrame,
) -> Pipeline:
    p = Pipeline("zetadex_transactions", base_path)

    @p.table(quality="bronze")
    def raw_transactions(pl) -> DataFrame:
        return raw

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_transactions(pl) -> DataFrame:
        # :340-358 — successful txs with derived date/hour partitions
        return (
            pl.read("raw_transactions")
            .filter("is_successful")
            .withColumn("date_", F.to_date("block_time"))
            .withColumn(
                "hour_", F.date_format("block_time", "HH").cast("int")
            )
        )

    @p.view()
    def exploded_instructions(pl) -> DataFrame:
        # :377 posexplode keeps the instruction ordinal for event pairing
        return pl.read("cleaned_transactions").select(
            "signature",
            "block_time",
            "date_",
            F.posexplode("instructions").alias("instruction_index", "instruction"),
        )

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_ix_deposit(pl) -> DataFrame:
        # :379-399 — name prefix predicate + nested projection + scaling
        ix = pl.read("exploded_instructions").filter(
            F.col("instruction.name").startswith("deposit")
        )
        return ix.select(
            "signature",
            "block_time",
            "date_",
            F.col("instruction.accounts.named.authority").alias("authority"),
            F.col("instruction.accounts.named.margin_account").alias(
                "margin_account"
            ),
            (F.col("instruction.args.amount").cast("double") / PRICE_FACTOR).alias(
                "deposit_amount"
            ),
        )

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_ix_trade(pl) -> DataFrame:
        # :646-719 — maker (crank_event_queue + trade_event) ∪ taker
        # (place_order* + merged place/trade event payloads)
        ix = pl.read("exploded_instructions")

        maker_events = ix.filter(
            F.col("instruction.name") == "crank_event_queue"
        ).select(
            "signature",
            "block_time",
            "date_",
            F.explode("instruction.events").alias("event"),
        ).filter(F.col("event.name").startswith("trade_event")).select(
            "signature",
            "block_time",
            "date_",
            F.lit("maker").alias("maker_taker"),
            F.col("event.event").alias("payload"),
        )

        # taker: the reference merges place_order_event + trade_event with a
        # Python UDF (:310-329).  Pure-column replacement: pick each struct
        # with filter()[0] and merge the payload maps JVM-side.
        taker_ix = ix.filter(
            F.col("instruction.name").rlike("^place_(perp_)?order(_v[0-9]+)?$")
        ).filter(
            F.array_contains("instruction.events.name", "place_order_event")
            & F.exists(
                "instruction.events",
                lambda e: e["name"].startswith("trade_event"),
            )
        )
        place_payload = F.element_at(
            F.expr("filter(instruction.events, e -> e.name = 'place_order_event')"),
            1,
        )["event"]
        trade_payload = F.element_at(
            F.expr(
                "filter(instruction.events, e -> e.name like 'trade_event%')"
            ),
            1,
        )["event"]
        taker_events = taker_ix.select(
            "signature",
            "block_time",
            "date_",
            F.lit("taker").alias("maker_taker"),
            F.map_concat(
                F.map_filter(
                    place_payload, lambda k, v: ~F.map_contains_key(trade_payload, k)
                ),
                trade_payload,
            ).alias("payload"),
        )

        events = maker_events.unionByName(taker_events)
        zg = pl.read("zetagroup_dim")
        # stream-static dim join (:380-387): payload zeta_group → asset
        return (
            events.join(
                F.broadcast(zg),
                events["payload"]["zeta_group"] == zg["zetagroup_pub_key"],
                "left",
            )
            .select(
                "signature",
                "block_time",
                "date_",
                "maker_taker",
                F.col("underlying").alias("asset"),
                F.col("payload")["user"].alias("authority"),
                F.col("payload")["margin_account"].alias("margin_account"),
                # §1.2 implicit string→numeric casts from map payloads
                (F.col("payload")["price"].cast("double") / PRICE_FACTOR).alias(
                    "price"
                ),
                (F.col("payload")["size"].cast("double") / SIZE_FACTOR).alias(
                    "size"
                ),
                (F.col("payload")["is_bid"] == "true").alias("is_bid"),
            )
            .withColumn("volume", F.col("price") * F.col("size"))
        )

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_ix_withdraw(pl) -> DataFrame:
        # :401-441 — mirror of the deposit family under the withdraw prefix
        ix = pl.read("exploded_instructions").filter(
            F.col("instruction.name").startswith("withdraw")
        )
        return ix.select(
            "signature",
            "block_time",
            "date_",
            F.col("instruction.accounts.named.authority").alias("authority"),
            F.col("instruction.accounts.named.margin_account").alias(
                "margin_account"
            ),
            (F.col("instruction.args.amount").cast("double") / PRICE_FACTOR).alias(
                "withdraw_amount"
            ),
        )

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_ix_order_complete(pl) -> DataFrame:
        # :504-556 — CancelOrder variants + fill/trigger names, then the
        # order_complete_event payloads, resolved to an asset via the markets
        # dim with the event's own asset as fallback
        ix = pl.read("exploded_instructions").filter(
            F.col("instruction.name").startswith("crank_event_queue")
            | F.col("instruction.name").rlike("^place_(perp_)?order(_v[0-9]+)?$")
            | F.col("instruction.name").rlike("^execute_trigger_order(_v[0-9]+)?$")
            | F.col("instruction.name").contains("cancel")
        )
        ev = ix.select(
            "signature",
            "block_time",
            "date_",
            F.col("instruction.name").alias("name"),
            F.col("instruction.accounts.named.authority").alias("authority"),
            F.col("instruction.accounts.named.market").alias("market"),
            F.explode("instruction.events").alias("event"),
        ).filter(F.col("event.name").startswith("order_complete_event"))
        mk = pl.read("markets_dim")
        return (
            ev.join(
                F.broadcast(mk), ev["market"] == mk["market_pub_key"], "left"
            )
            .select(
                "signature",
                "block_time",
                "date_",
                "name",
                "authority",
                F.coalesce(
                    F.col("underlying"), F.upper(F.col("event.event.asset"))
                ).alias("asset"),
                F.col("event.event.margin_account").alias("margin_account"),
                F.col("event.event.order_complete_type").alias(
                    "order_complete_type"
                ),
                F.col("event.event.side").alias("side"),
                (
                    F.col("event.event.unfilled_size").cast("double") / SIZE_FACTOR
                ).alias("unfilled_size"),
                F.col("event.event.order_id").alias("order_id"),
                F.col("event.event.client_order_id").alias("client_order_id"),
            )
        )

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_ix_liquidate(pl) -> DataFrame:
        # :558-625 — liquidate* instructions paired with liquidation_event;
        # signed event size → bid/ask side; price/size factor scaling
        ix = pl.read("exploded_instructions").filter(
            F.col("instruction.name").startswith("liquidate")
        )
        ev = ix.select(
            "signature",
            "block_time",
            "date_",
            F.col("instruction.name").alias("name"),
            (F.col("instruction.args.size").cast("double") / SIZE_FACTOR).alias(
                "desired_size"
            ),
            F.col("instruction.accounts.named.market").alias("market"),
            F.explode("instruction.events").alias("event"),
        ).filter(F.col("event.name").startswith("liquidation_event"))
        mk = pl.read("markets_dim")
        scaled = [
            ("liquidator_reward", PRICE_FACTOR),
            ("insurance_reward", PRICE_FACTOR),
            ("cost_of_trades", PRICE_FACTOR),
            ("mark_price", PRICE_FACTOR),
        ]
        return (
            ev.join(
                F.broadcast(mk), ev["market"] == mk["market_pub_key"], "left"
            )
            .select(
                "signature",
                "block_time",
                "date_",
                "name",
                F.coalesce(
                    F.col("underlying"), F.upper(F.col("event.event.asset"))
                ).alias("asset"),
                "desired_size",
                F.when(
                    F.col("event.event.size").cast("double") > 0, "bid"
                )
                .otherwise("ask")
                .alias("side"),
                F.col("event.event.liquidatee").alias("liquidatee"),
                F.col("event.event.liquidator").alias("liquidator"),
                *[
                    (F.col(f"event.event.{c}").cast("double") / fac).alias(c)
                    for c, fac in scaled
                ],
                (
                    F.abs(F.col("event.event.size").cast("double")) / SIZE_FACTOR
                ).alias("liquidated_size"),
            )
        )

    @p.table(quality="silver", partition_by=["date_"])
    def cleaned_ix_funding(pl) -> DataFrame:
        # :723-760 — funding applications with zero-change rows dropped
        ev = (
            pl.read("exploded_instructions")
            .select(
                "signature",
                "block_time",
                "date_",
                F.col("instruction.name").alias("name"),
                F.explode("instruction.events").alias("event"),
            )
            .filter(F.col("event.name").startswith("apply_funding_event"))
            .filter(F.col("event.event.balance_change").cast("double") != 0)
        )
        return ev.select(
            "signature",
            "block_time",
            "date_",
            "name",
            F.upper(F.col("event.event.asset")).alias("asset"),
            F.col("event.event.user").alias("authority"),
            F.col("event.event.margin_account").alias("margin_account"),
            (
                F.col("event.event.balance_change").cast("double") / PRICE_FACTOR
            ).alias("balance_change"),
            (
                F.col("event.event.funding_rate").cast("double") / PRICE_FACTOR
            ).alias("funding_rate"),
            (
                F.col("event.event.oracle_price").cast("double") / PRICE_FACTOR
            ).alias("oracle_price"),
            (
                F.col("event.event.position_size").cast("double") / SIZE_FACTOR
            ).alias("position_size"),
        )

    @p.table(quality="silver")
    def zetagroup_dim(pl) -> DataFrame:
        # :332-337 — dim with rename underlying→asset downstream
        return zetagroup_mapping

    @p.table(quality="silver")
    def markets_dim(pl) -> DataFrame:
        return markets

    @p.table(quality="gold")
    def agg_ix_trade_asset_1h(pl) -> DataFrame:
        # :777-793 — hourly trade aggregates per asset
        t = pl.read("cleaned_ix_trade")
        return t.groupBy(
            F.date_trunc("hour", "block_time").alias("timestamp"), "asset"
        ).agg(
            F.count(F.lit(1)).alias("trade_count"),
            dec_sum("volume", "volume"),
            F.countDistinct("authority").alias("traders"),
        )

    @p.table(quality="gold")
    def agg_ix_deposit_user_1h(pl) -> DataFrame:
        # :866-883 — user-hourly deposit gold
        d = pl.read("cleaned_ix_deposit")
        return d.groupBy(
            F.date_trunc("hour", "block_time").alias("timestamp"),
            "authority",
            "margin_account",
        ).agg(
            F.count(F.lit(1)).alias("deposit_count"),
            dec_sum("deposit_amount", "deposit_amount"),
        )

    @p.table(quality="gold")
    def agg_ix_withdraw_user_1h(pl) -> DataFrame:
        # :885-911 — user-hourly withdraw gold
        d = pl.read("cleaned_ix_withdraw")
        return d.groupBy(
            F.date_trunc("hour", "block_time").alias("timestamp"),
            "authority",
            "margin_account",
        ).agg(
            F.count(F.lit(1)).alias("withdraw_count"),
            dec_sum("withdraw_amount", "withdraw_amount"),
        )

    @p.table(quality="gold")
    def agg_funding_rate_user_asset_1h(pl) -> DataFrame:
        # :923-946 — funding hourly gold; avgs as exact decimal-sum/count
        # (order-independent, unlike naive double avg)
        d = pl.read("cleaned_ix_funding")
        return d.groupBy(
            F.date_trunc("hour", "block_time").alias("timestamp"),
            "asset",
            "authority",
            "margin_account",
        ).agg(
            dec_sum("balance_change", "balance_change"),
            dec_avg("funding_rate", "funding_rate"),
            dec_avg("oracle_price", "oracle_price"),
            dec_avg("position_size", "position_size"),
        )

    @p.table(quality="gold")
    def agg_ix_liquidate_asset_1h(pl) -> DataFrame:
        # hourly liquidation gold (same bucket shape as :777-793 applied to
        # the liquidation family)
        d = pl.read("cleaned_ix_liquidate")
        return d.groupBy(
            F.date_trunc("hour", "block_time").alias("timestamp"), "asset"
        ).agg(
            F.count(F.lit(1)).alias("liquidation_count"),
            dec_sum("liquidated_size", "liquidated_size"),
            dec_sum("liquidator_reward", "liquidator_reward"),
            dec_sum("insurance_reward", "insurance_reward"),
            F.countDistinct("liquidatee").alias("liquidatees"),
        )

    @p.table(quality="gold")
    def fee_tiers(pl) -> DataFrame:
        # :1891-1945 — per-authority 30d rolling volume → 8-branch fee tier +
        # multiplier, keeping only the latest row per authority.  The
        # reference anchors "last 30 days" to current_date(); engine rule
        # (clock.py) resolves explicit/env clock first, else the data max —
        # a single-row scalar pull, sanctioned like A13/O3.
        from zeta_etl_spark.clock import as_of, data_as_of

        t = pl.read("cleaned_ix_trade")
        clock = as_of()
        if clock is None:
            clock = data_as_of(t, "block_time")
        hourly = (
            t.withColumn("timestamp", F.date_trunc("hour", "block_time"))
            .filter(
                F.col("timestamp") >= F.date_sub(clock.cast("date"), 35)
            )
            .groupBy("timestamp", "authority")
            .agg(F.sum(F.col("volume").cast("DECIMAL(32,6)")).alias("_vol"))
        )
        w30 = (
            Window.partitionBy("authority")
            .orderBy(F.unix_timestamp(F.col("timestamp").cast("timestamp")))
            .rangeBetween(-30 * 86400, 0)
        )
        tiers = (
            hourly.withColumn("_tv30", F.sum("_vol").over(w30))
            .withColumn(
                "fee_tier",
                F.when(F.col("_tv30") >= 50_000_000, 7)
                .when(F.col("_tv30") >= 20_000_000, 6)
                .when(F.col("_tv30") >= 10_000_000, 5)
                .when(F.col("_tv30") >= 5_000_000, 4)
                .when(F.col("_tv30") >= 1_000_000, 3)
                .when(F.col("_tv30") >= 500_000, 2)
                .when(F.col("_tv30") >= 100_000, 1)
                .otherwise(0),
            )
            .withColumn(
                "fee_multiplier",
                F.when(F.col("fee_tier") == 7, 0.3)
                .when(F.col("fee_tier") == 6, 0.4)
                .when(F.col("fee_tier") == 5, 0.5)
                .when(F.col("fee_tier") == 4, 0.6)
                .when(F.col("fee_tier") == 3, 0.7)
                .when(F.col("fee_tier") == 2, 0.8)
                .when(F.col("fee_tier") == 1, 0.9)
                .otherwise(1.0),
            )
        )
        w_latest = Window.partitionBy("authority").orderBy(F.desc("timestamp"))
        return (
            tiers.withColumn("_rn", F.row_number().over(w_latest))
            .filter(F.col("_rn") == 1)
            .select(
                "timestamp",
                "authority",
                F.col("_vol").cast("double").alias("volume"),
                F.col("_tv30").cast("double").alias("total_volume_30d"),
                "fee_tier",
                "fee_multiplier",
            )
        )

    @p.table(quality="gold")
    def agg_ix_trade_asset_24h_rolling(pl) -> DataFrame:
        # :829-855 — min/max spine, crossJoin assets, left join + fillna,
        # 24h rangeBetween rolling sums
        hourly = pl.read("agg_ix_trade_asset_1h")
        bounds = hourly.agg(
            F.min("timestamp").alias("lo"), F.max("timestamp").alias("hi")
        )
        spine = bounds.select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("timestamp")
        )
        # bound: asset is the exchange's listed-market enum (dozens, not
        # data-sized) — the closed domain the whole pipeline keys on
        assets = hourly.select("asset").distinct()
        dense = (
            spine.transform(with_scalar_frame(assets, bound=256))
            .join(hourly, ["timestamp", "asset"], "left")
            .fillna({"trade_count": 0, "volume": 0.0})
        )
        w = (
            Window.partitionBy("asset")
            .orderBy(F.unix_timestamp(F.col("timestamp").cast("timestamp")))
            .rangeBetween(-24 * 3600, 0)
        )
        return dense.select(
            "timestamp",
            "asset",
            "trade_count",
            "volume",
            F.sum("trade_count").over(w).cast("bigint").alias("trade_count_24h"),
            F.sum(F.col("volume").cast("DECIMAL(32,6)"))
            .over(w)
            .cast("double")
            .alias("volume_24h"),
        )

    return p
