package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bronze-table fixture rows shaped like the reference's bronze layer —
  * shared by OlympicPipelineSpec (golden assertions) and
  * ObjectStoreSpec (the same pipeline over the graftstore:// scheme).
  */
object OlympicFixtures {

  val countries = Seq("germany", "france", "united states", "united kingdom")

  def bronzeBiodata(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1, "Competed in Olympic Games", "Male", "Carl•Lewis",
        "1 July 1961 in Birmingham, Alabama (USA)", null.asInstanceOf[String],
        "188 cm / 80 kg", "Santa Monica TC, Santa Monica (USA)", "United States of America"),
      (2, "Competed in Olympic Games", "Female", "Jackie•Joyner-Kersee",
        "3 March 1962 in East St. Louis, Illinois (USA)", null.asInstanceOf[String],
        "178 cm / 70 kg", "UCLA / World Class AC", "United States"),
      (3, "Competed in Olympic Games", "Male", "Emil•Zátopek",
        "19 September 1922 in Kopřivnice, Moravskoslezský (TCH)", "21 November 2000 in Praha, Hlavní město Praha (CZE)",
        "182 cm", null.asInstanceOf[String], "Czechoslovakia"),
      (4, "Competed in Olympic Games", "Male", "Mystery•Man",
        "1950", null.asInstanceOf[String], null.asInstanceOf[String],
        "(GER)", "West Germany")
    ).toDF("Athlete_Id", "Roles", "Sex", "Used name", "Born", "Died",
      "Measurements", "Affiliations", "NOC")
  }

  def bronzeResults(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1, "1984 Summer Olympics", "Athletics", "100 metres, Men", "=1", "Gold"),
      (1, "1984 Summer Olympics", "Athletics", "Long Jump, Men", "1", "Gold"),
      (2, "1988 Summer Olympics", "Athletics", "Heptathlon, Women", "1", "Gold"),
      (3, "1952 Summer Olympics", "Athletics", "Marathon, Men", "1", "Gold"),
      (3, "1952 Summer Olympics", "Swimming", "Imagined, Men", "DNS", null.asInstanceOf[String]),
      (3, "1952 Summer Olympics", "Athletics", "5000 metres, Men", "1", "Gold"),
      (4, "1972 Summer Olympics", "Rowing", "Eights, Men", "5", null.asInstanceOf[String])
    ).toDF("Athlete_Id", "Games", "Discipline", "Event", "Pos", "Medal")
  }

  def bronzeEditions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("1", "1952", "Helsinki", "Finland", "19 July", "3 August", "20 July - 3 August", null.asInstanceOf[String], "Summer Olympics", "XV Olympiad"),
      ("2", "1984", "Los Angeles", "United States", null.asInstanceOf[String], "12 August", "28 July - 12 August", "LA Games", "Summer Olympics", "XXIII Olympiad"),
      ("3", "1988", "Seoul", "South Korea", "17 September", "2 October", "17 September - 2 October", null.asInstanceOf[String], "Summer Olympics", "XXIV Olympiad"),
      ("4", "1972", "Munich", "West Germany", "26 August", "11 September", "26 August - 11 September", null.asInstanceOf[String], "Summer Olympics", "XX Olympiad"),
      ("5", "776 BC", "Olympia", "Greece", null.asInstanceOf[String], null.asInstanceOf[String], "6-13 April", null.asInstanceOf[String], "Ancient Olympic Games", "Ancient")
    ).toDF("#", "Year", "City", "Country", "Opened", "Closed", "Competition", "Unnamed: 7", "Game_Type", "Edition_Name")
  }

  def isoLookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("United States Of America", "US", "USA"),
      ("Germany", "DE", "DEU"),
      ("France", "FR", "FRA"))
      .toDF("English short name lower case", "Alpha-2 code", "Alpha-3 code")
  }
}
